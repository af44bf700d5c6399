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


def test_shingle_relation_equals_inline_expr(spark):
    """shingle_relation (token array materialized once — the r11
    re-tokenize fix) must emit byte-identical gram arrays to the
    inline shingle_expr it replaced, across every consumer shape:
    array / keep_empty / explode, including sub-n-token and
    empty/whitespace documents."""
    from team_aragon_spark.operators import text_dedup as td

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b"),               # shorter than n -> empty set
            (3, ""),                  # empty text
            (4, "   "),               # whitespace only
            (5, "x  y\tz x  y z x"),  # runs of whitespace, repeats
            (6, "a b c"),             # exactly n tokens
        ],
        "doc_id bigint, text string",
    )
    inline = docs.select(
        "doc_id", F.expr(td.shingle_expr("text", 3)).alias("__sh")
    )
    keep = td.shingle_relation(docs, "text", "doc_id", 3, keep_empty=True)
    assert _rows(inline) == _rows(keep)

    filt = td.shingle_relation(docs, "text", "doc_id", 3)
    assert _rows(inline.filter(F.size("__sh") > 0)) == _rows(filt)

    ex_inline = docs.select(
        "doc_id", F.explode(F.expr(td.shingle_expr("text", 3))).alias("g")
    )
    ex = td.shingle_relation(docs, "text", "doc_id", 3, out_col="g", explode=True)
    assert _rows(ex_inline) == _rows(ex) and len(_rows(ex)) > 0

    extra = td.shingle_relation(
        docs, "text", "doc_id", 3, extra_cols=(F.length("text").alias("L"),)
    )
    assert extra.columns == ["doc_id", "L", "__sh"]


def test_shingle_relation_plan_materializes_tokens_once(spark):
    """The physical plan must carry the split() exactly once per
    consumer branch — the inline form evaluated it per gram position
    (O(tokens x grams)); CollapseProject must not re-inline it."""
    from team_aragon_spark.operators import text_dedup as td

    docs = spark.createDataFrame([(1, "a b c d")], "doc_id bigint, text string")
    plan = (
        td.shingle_relation(docs, "text", "doc_id", 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the gram lambda must slice the materialized __tk column, never a
    # re-inlined split() (pushdown may copy split into the Filter — a
    # linear, per-row cost — but the per-gram lambda must not carry it)
    assert "slice(__tk" in plan
    lam = plan[plan.index("lambdafunction") :].split("\n", 1)[0]
    assert "split(" not in lam


def test_eager_gd_weights_equal_lazy_chain(spark):
    """q313's eagerly-iterated GD (_logreg_gd_weights) must produce
    the bit-identical weight sequence of the lazy broadcast chain it
    replaced — same expressions, weights as literals, Spark-side
    rounding throughout."""
    from team_aragon_spark.plans.star_queries import (
        _LR_ITERS,
        _LR_RATE,
        _logreg_gd_weights,
    )

    feats = spark.createDataFrame(
        [
            (1.0, 0.25, 0.01, 0.5),
            (0.0, 0.125, 0.04, 1.0),
            (1.0, 0.3, 0.0, 0.155),
            (0.0, 0.05, 0.2, 0.9),
            (0.0, 0.4, 0.11, 0.345),
        ],
        "y double, x1 double, x2 double, x3 double",
    ).persist()
    got = _logreg_gd_weights(feats)

    w = spark.createDataFrame(
        [(0.0, 0.0, 0.0, 0.0)], "w0 double, w1 double, w2 double, w3 double"
    )
    z = (
        F.col("w0")
        + F.col("w1") * F.col("x1")
        + F.col("w2") * F.col("x2")
        + F.col("w3") * F.col("x3")
    )
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 9)
    for _ in range(_LR_ITERS):
        j = feats.crossJoin(F.broadcast(w)).withColumn("p", p)
        g = j.agg(
            F.round(F.avg(F.col("p") - F.col("y")), 6).alias("g0"),
            F.round(F.avg((F.col("p") - F.col("y")) * F.col("x1")), 6).alias("g1"),
            F.round(F.avg((F.col("p") - F.col("y")) * F.col("x2")), 6).alias("g2"),
            F.round(F.avg((F.col("p") - F.col("y")) * F.col("x3")), 6).alias("g3"),
        )
        w = g.crossJoin(F.broadcast(w)).select(
            F.round(F.col("w0") - _LR_RATE * F.col("g0"), 6).alias("w0"),
            F.round(F.col("w1") - _LR_RATE * F.col("g1"), 6).alias("w1"),
            F.round(F.col("w2") - _LR_RATE * F.col("g2"), 6).alias("w2"),
            F.round(F.col("w3") - _LR_RATE * F.col("g3"), 6).alias("w3"),
        )
    want = tuple(w.first())
    assert got == want


def test_single_pass_medians_equal_per_column(spark):
    """q313's unpivoted one-pass medians must equal the three
    per-column exact_grouped_percentiles calls they replaced."""
    from team_aragon_spark.operators.stats import exact_grouped_percentiles

    sc = spark.createDataFrame(
        [
            ("s0", 0.1, -3.0, 55.0),
            ("s0", 0.2, -2.5, 60.0),
            ("s0", 0.3, -2.0, 44.0),
            ("s1", 0.9, -1.0, 90.0),
            ("s1", 0.8, -1.5, 10.0),
        ],
        "source string, s_lr double, s_lp double, s_rd double",
    ).persist()
    longf = sc.selectExpr(
        "source", "stack(3, 'lr', s_lr, 'lp', s_lp, 'rd', s_rd) AS (m, v)"
    )
    got = _rows(
        exact_grouped_percentiles(longf, "v", ["source", "m"], [0.5])
        .groupBy("source")
        .agg(
            F.max(F.when(F.col("m") == "lr", F.col("p_50"))).alias("m_lr"),
            F.max(F.when(F.col("m") == "lp", F.col("p_50"))).alias("m_lp"),
            F.max(F.when(F.col("m") == "rd", F.col("p_50"))).alias("m_rd"),
        )
    )
    meds = None
    for col, alias in [("s_lr", "m_lr"), ("s_lp", "m_lp"), ("s_rd", "m_rd")]:
        m = exact_grouped_percentiles(sc, col, ["source"], [0.5]).select(
            "source", F.col("p_50").alias(alias)
        )
        meds = m if meds is None else meds.join(m, "source")
    assert got == _rows(meds)


def test_kcore_driver_peel_equals_distributed_semantics(spark):
    """The vectorized driver peel must reproduce the synchronous
    incremental-degree peel round for round: same per-round removal
    counts, same surviving core — including cascades (a node that
    only drops below k after its neighbor is removed) and
    early-exit."""
    import numpy as np

    from team_aragon_spark.operators import graph

    # graph: a 4-clique (core at k=3) + a tail 5-6-7 hanging off node 1
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (1, 5), (5, 6), (6, 7),
    ]
    pairs = spark.createDataFrame(edges, "a bigint, b bigint")
    removed, core = graph.kcore_peel_rounds(pairs, 3, 12)
    # round 1 removes 7 (d=1), 6 (d=2), 5 (d=2)... synchronous: d(5)=2,
    # d(6)=2, d(7)=1 all < 3 -> removed together; clique survives
    assert removed == [(1, 3)]
    assert sorted(core.tolist()) == [1, 2, 3, 4]

    # cascade: a chain needs multiple rounds at k=2
    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "a bigint, b bigint"
    )
    removed2, core2 = graph.kcore_peel_rounds(chain, 2, 12)
    assert removed2 == [(1, 2), (2, 2), (3, 1)] and core2.size == 0

    # replicate the distributed loop in-test and compare on a random graph
    rng = np.random.RandomState(7)
    edg = {(int(a), int(b)) for a, b in rng.randint(0, 40, (120, 2)) if a < b}
    pr = spark.createDataFrame(sorted(edg), "a bigint, b bigint").persist()
    got_removed, got_core = graph.kcore_peel_rounds(pr, 3, 12)
    deg = (
        pr.select(F.col("a").alias("node"))
        .unionByName(pr.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint()
    )
    want_removed = []
    for rnd in range(1, 13):
        rem = deg.filter(F.col("d") < 3).select("node").localCheckpoint()
        n_rem = rem.count()
        if n_rem == 0:
            break
        want_removed.append((rnd, n_rem))
        rm = F.broadcast(rem)
        dec = (
            pr.join(rm, pr["a"] == rm["node"], "left_semi")
            .select(F.col("b").alias("node"))
            .unionByName(
                pr.join(rm, pr["b"] == rm["node"], "left_semi").select(
                    F.col("a").alias("node")
                )
            )
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        deg = (
            deg.join(F.broadcast(rem), "node", "left_anti")
            .join(dec, "node", "left")
            .select(
                "node", (F.col("d") - F.coalesce(F.col("c"), F.lit(0))).alias("d")
            )
            .localCheckpoint()
        )
    want_core = sorted(r.node for r in deg.select("node").collect())
    assert got_removed == want_removed
    assert sorted(got_core.tolist()) == want_core


def test_ssjoin_auto_gate_dispatch(spark):
    """set_similarity_join's auto strategy must pick the count join on
    a hot-item-free input (fan-out within the factor) and keep the
    prefix path when a hot item blows the measured fan-out — and both
    dispatches stay exact (outputs equal the forced strategies)."""
    from team_aragon_spark.operators.setsim import set_similarity_join

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    cold = spark.createDataFrame(
        [(i, f"it{i}{j}") for i in range(8) for j in range(4)]
        + [(i, f"sh{i % 2}") for i in range(8)],
        "sid int, item string",
    )
    got = set_similarity_join(cold, "sid", "item", 0.5)
    assert "array_intersect" not in plan_of(got)  # count path
    assert _rows(got) == _rows(
        set_similarity_join(cold, "sid", "item", 0.5, strategy="count")
    )

    hot = spark.createDataFrame(
        [(i, "hot") for i in range(200)], "sid int, item string"
    )
    got_hot = set_similarity_join(hot, "sid", "item", 0.5)
    assert "array_intersect" in plan_of(got_hot)  # prefix path
    assert _rows(got_hot) == _rows(
        set_similarity_join(hot, "sid", "item", 0.5, strategy="prefix")
    )


def test_rolling_hash_tok_col_equals_inline(spark):
    """rolling_hash_fingerprints over a pre-materialized token column
    must emit the identical fingerprint sets as the inline-tokenizer
    form it optimizes (q39's r11 rewire)."""
    from team_aragon_spark.functions import rolling_hash_fingerprints

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i % 7}" for i in range(40))), (2, "a b"), (3, "")],
        "doc_id bigint, text string",
    )
    inline = docs.select(
        "doc_id", rolling_hash_fingerprints("text", keep_every=2).alias("f")
    )
    toked = docs.select(
        "doc_id", F.expr(r"split(trim(text), '\\s+')").alias("__tk")
    ).select(
        "doc_id",
        rolling_hash_fingerprints("text", keep_every=2, tok_col="__tk").alias("f"),
    )
    assert _rows(inline) == _rows(toked)


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
