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
