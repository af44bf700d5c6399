"""Property-based cross-checks (hypothesis): the distributed as-of and
range joins must agree with reference implementations (pandas
merge_asof / brute-force nested loop) on arbitrary small inputs, and
operators must be total on empty inputs."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from team_aragon_spark.operators.asof import asof_join
from team_aragon_spark.operators.range_join import interval_join

EPOCH = datetime(2024, 1, 1)


def _ts(seconds: int) -> datetime:
    return EPOCH + timedelta(seconds=seconds)


# Keys from a tiny domain force collisions; right-side (key, ts) pairs are
# unique so backward-as-of has a single correct answer (no tie ambiguity).
left_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 500)), min_size=1, max_size=12
)
right_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 500)),
    min_size=1,
    max_size=12,
    unique_by=lambda r: (r[0], r[1]),
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=left_rows,
    right=right_rows,
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tol_s=st.sampled_from([None, 0, 30, 200]),
)
def test_asof_join_agrees_with_pandas_merge_asof(spark, left, right, direction, tol_s):
    ldf = spark.createDataFrame(
        [(k, _ts(s), i) for i, (k, s) in enumerate(left)], ["k", "ts", "lid"]
    )
    rdf = spark.createDataFrame(
        [(k, _ts(s), float(s)) for k, s in right], ["k", "rts", "rv"]
    )
    tolerance = None if tol_s is None else f"INTERVAL '{tol_s}' SECOND"
    got = {
        r.lid: r.rv
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="ts", right_ts="rts", value_cols=["rv"],
            direction=direction, tolerance=tolerance,
        ).collect()
    }
    lp = pd.DataFrame(
        {"k": [k for k, _ in left], "ts": [_ts(s) for _, s in left],
         "lid": range(len(left))}
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        {"k": [k for k, _ in right], "rts": [_ts(s) for _, s in right],
         "rv": [float(s) for _, s in right]}
    ).sort_values("rts", kind="stable")
    expect_df = pd.merge_asof(
        lp, rp, left_on="ts", right_on="rts", by="k", direction=direction,
        allow_exact_matches=True,
        tolerance=None if tol_s is None else timedelta(seconds=tol_s),
    )
    expect = {
        int(r.lid): (None if pd.isna(r.rv) else float(r.rv))
        for r in expect_df.itertuples()
    }
    assert got == expect


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    points=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 1000)), min_size=1, max_size=12),
    intervals=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000), st.integers(0, 400)),
        min_size=1,
        max_size=8,
    ),
    width=st.sampled_from([60, 150, 3600]),
)
def test_interval_join_agrees_with_nested_loop(spark, points, intervals, width):
    pdf = spark.createDataFrame(
        [(k, _ts(s), i) for i, (k, s) in enumerate(points)], ["k", "pts", "pid"]
    )
    idf = spark.createDataFrame(
        [(k, _ts(s), _ts(s + d), j) for j, (k, s, d) in enumerate(intervals)],
        ["k", "istart", "iend", "iid"],
    )
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            pdf, idf, "pts", "istart", "iend", equi_keys=["k"], bucket_width=width
        ).collect()
    }
    expect = {
        (i, j)
        for i, (pk, ps) in enumerate(points)
        for j, (ik, istart, d) in enumerate(intervals)
        if pk == ik and istart <= ps <= istart + d
    }
    assert got == expect


def test_operators_total_on_empty_inputs(spark):
    """Every custom operator must return an empty result (not raise) on
    empty input DataFrames."""
    from team_aragon_spark.operators.similarity import srp_neardup_pairs
    from team_aragon_spark.operators.text_dedup import minhash_neardup_pairs

    empty_ev = spark.createDataFrame([], "k int, ts timestamp, v double")
    empty_right = spark.createDataFrame([], "k int, rts timestamp, rv double")
    assert (
        asof_join(empty_ev, empty_right, on=["k"], left_ts="ts",
                  right_ts="rts", value_cols=["rv"]).count() == 0
    )
    empty_iv = spark.createDataFrame([], "k int, istart timestamp, iend timestamp")
    assert (
        interval_join(empty_ev, empty_iv, "ts", "istart", "iend",
                      equi_keys=["k"]).count() == 0
    )
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert minhash_neardup_pairs(empty_docs).count() == 0
    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert srp_neardup_pairs(empty_emb, dim=64).count() == 0


def test_minhash_signature_estimates_jaccard(spark):
    """Property: the fraction of matching MinHash components is an
    unbiased estimator of Jaccard similarity — with k=96 hashes the
    estimate must sit within ~4 standard errors of the exact value."""
    from team_aragon_spark.operators.text_dedup import (
        jaccard_pairs,
        minhash_signatures,
    )

    words = [f"w{i}" for i in range(60)]
    docs = [
        (0, " ".join(words)),               # base
        (1, " ".join(words[:40] + ["x"])),  # high overlap
        (2, " ".join(words[30:] + ["y", "z"])),  # partial overlap
        (3, "completely different tokens only here"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    sigs = {r.doc_id: r.signature for r in minhash_signatures(df).collect()}
    exact = {
        (r.a, r.b): r.jaccard
        for r in jaccard_pairs(df, threshold=0.0).collect()
    }
    import itertools

    for a, b in itertools.combinations(sorted(sigs), 2):
        est = sum(x == y for x, y in zip(sigs[a], sigs[b])) / len(sigs[a])
        j = exact.get((a, b), exact.get((b, a), 0.0))
        se = (j * (1 - j) / len(sigs[a])) ** 0.5
        assert abs(est - j) <= max(4 * se, 0.06), (a, b, est, j)


def test_ivf_total_on_empty_corpus(spark):
    from team_aragon_spark.operators.similarity import ivf_topk

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = ivf_topk(empty, empty, k=3, n_cells=4)
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "neighbor_id", "cosine"}
