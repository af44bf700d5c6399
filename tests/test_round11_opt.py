"""Round-11 optimization pins: every physical rewrite in the
optimization round must be value-identical to the plan it replaced.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from team_aragon_spark.operators import similarity
from team_aragon_spark.sources.catalog import read_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_topk_shortlist_equals_brute(spark, monkeypatch):
    """The driver-side BLAS shortlist (guide §3.2 prune-with-proxy)
    must reproduce the distributed brute top-k bit-for-bit — winners,
    order keys, and rounded cosines."""
    emb = read_table(spark, "embeddings", SF)
    monkeypatch.setattr(similarity, "_SHORTLIST_MIN_FOLDS", 0)
    fast = _rows(similarity.cosine_topk_bruteforce(emb, emb, k=10))
    # force the fully distributed plan by closing the gate
    monkeypatch.setattr(similarity, "_SHORTLIST_MAX_CORPUS", -1)
    brute = _rows(similarity.cosine_topk_bruteforce(emb, emb, k=10))
    assert fast == brute and len(fast) > 0


def test_session_stats_max_equals_count_distinct(spark):
    """session_id is a dense running count per user, so the max-based
    n_sessions must equal the countDistinct it replaced, row for row."""
    from team_aragon_spark.operators.windows import sessionize, session_stats

    ev = read_table(spark, "events", SF)
    got = _rows(session_stats(ev))
    s = sessionize(ev)
    want = _rows(
        s.groupBy("user_id").agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )
    assert got == want and len(got) > 0


def test_cc_driver_gate_equals_distributed(spark, monkeypatch):
    """The gated driver union-find must reproduce the distributed
    min-label propagation exactly — same nodes, same min-id labels —
    including chains, self-loops and duplicate edges."""
    from team_aragon_spark.operators import graph

    edges = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 2), (5, 5), (7, 8), (9, 8), (10, 11), (11, 12), (12, 13)],
        "a bigint, b bigint",
    )
    fast = _rows(graph.connected_components(edges))
    monkeypatch.setattr(graph, "_CC_DRIVER_MAX_EDGES", -1)
    dist = _rows(graph.connected_components(edges))
    assert fast == dist and len(fast) > 0


def test_topk_shortlist_declines_zero_norm(spark):
    """A zero-norm vector carries NULL cosine through try_divide; the
    shortlist cannot model NULL ordering so it must decline (return
    None) and leave the distributed plan in charge."""
    emb = read_table(spark, "embeddings", SF).limit(200)
    dim = len(emb.select("embedding").first()[0])
    zero = spark.createDataFrame(
        [(99_999_999, [0.0] * dim)], "vec_id bigint, embedding array<double>"
    ).select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    poisoned = emb.select("vec_id", "embedding").unionByName(zero)
    c = poisoned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("__cv")
    )
    q = poisoned.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv")
    )
    assert similarity._topk_shortlist(c, q, 5, 4) is None
