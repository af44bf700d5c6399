"""Testdata schema contract.

Round 3's entire regression traced to one silent upstream change:
`/root/testdata` was regenerated with `events.ts` stored as parquet
timestamp[us] instead of TIMESTAMP(NANOS), and 28 queries died at plan
time.  This module turns the next such change into ONE named test
failure instead of a driver-wide wipeout: it reads a row of every
star table through the engine's own `read_table` at every scale
factor present and pins the engine-side dtype of every column.

If this test fails after a testdata regeneration, the contract moved:
fix `sources/catalog.py` (or the pinned dtypes here, if the change is
intended) BEFORE trusting any other red test.  Documented in
TESTDATA.md.
"""

from __future__ import annotations

import os

import pytest

from team_aragon_spark.sources.catalog import read_table

# Engine-side dtypes (df.dtypes) per table — what every downstream
# plan assumes.  `ts`/date columns are pinned to timestamp_ntz: the
# schema-adaptive nanos shim in read_table normalizes both the old
# TIMESTAMP(NANOS) encoding (shimmed via div 1000) and the current
# timestamp[us] pass-through to a microsecond-resolution timestamp.
EXPECTED_DTYPES: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp_ntz",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
@pytest.mark.parametrize("table", sorted(EXPECTED_DTYPES))
def test_engine_dtypes_pinned(spark, sf_dir, table):
    df = read_table(spark, table, sf_dir)
    assert dict(df.dtypes) == EXPECTED_DTYPES[table], (
        f"{sf_dir}/{table}: testdata schema contract moved — fix "
        "sources/catalog.py (see round-3 events.ts regression) before "
        "trusting other failures"
    )
    # one materialized row proves the file is readable end-to-end,
    # not just that footer metadata parses
    assert df.limit(1).count() in (0, 1)


def test_events_ts_values_sane(spark):
    """ts must decode to the 2024 epoch — a mis-applied nanos shim
    lands ~1970 (div of an already-micros value) or throws."""
    from pyspark.sql import functions as F

    df = read_table(spark, "events", SF_DIRS[0])
    row = df.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    assert row.lo.year >= 2000, row
    assert row.hi.year <= 2100, row


@pytest.mark.parametrize("sf_dir", [d for d in (
    "/root/testdata/sf0.001", "/root/testdata/sf0.01") if os.path.isdir(d)])
def test_value_invariants_new_queries_rely_on(spark, sf_dir):
    """Data invariants (beyond dtypes) that registered queries assume.
    A regeneration that breaks one should fail HERE, by name, not as
    a mysterious driver hash mismatch:

    - documents.n_chars >= 1 — q126/q134 divide ln(u) by it (E-S
      weighted keys); 0 would produce -inf/NaN keys.
    - documents text/token floor — q93's pack arithmetic assumes
      token_count >= 1 for every doc (the div-vs-floor guard), and
      the corpus has no NULL text.
    - events.value / event_type / ts NOT NULL — q128's
      added/changed classification and q95/q114's max_by state read
      NULL value columns as 'snapshot row absent'.
    - doc token count < 2^20 — q133's winnowing encodes position
      into hash*2^20 + (2^20-1-pos); an overflow would silently
      corrupt fingerprints.
    """
    from pyspark.sql import functions as F

    from team_aragon_spark.operators import text

    docs = read_table(spark, "documents", sf_dir)
    r = docs.agg(
        F.min("n_chars").alias("min_chars"),
        F.sum(F.col("text").isNull().cast("int")).alias("null_text"),
        F.min(text.token_count(F.col("text"))).alias("min_toks"),
        F.max(text.token_count(F.col("text"))).alias("max_toks"),
    ).collect()[0]
    assert r.min_chars >= 1, "n_chars floor broken (q126/q134 E-S keys)"
    assert r.null_text == 0
    assert r.min_toks >= 1, "token floor broken (q93 pack arithmetic)"
    assert r.max_toks < (1 << 20), "winnowing position encoding (q133)"

    ev = read_table(spark, "events", sf_dir)
    n = ev.filter(
        F.col("value").isNull() | F.col("event_type").isNull() | F.col("ts").isNull()
    ).count()
    assert n == 0, "events NULLs break q128/q95/q114 state semantics"
