"""Every registered SQL-expressible query must match its DuckDB oracle
at sf0.001 (fast local replica of the driver's sf0.01 gate)."""

from __future__ import annotations

import pytest

from team_aragon_spark.plans.star_queries import QUERY_REGISTRY

from tests.conftest import SF_SMOKE
from tests.oracle import compare, duck_connection

ORACLE_QUERIES = [(n, qd) for n, qd in QUERY_REGISTRY.items() if qd.oracle is not None]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name,qd", ORACLE_QUERIES, ids=[n for n, _ in ORACLE_QUERIES])
def test_query_matches_oracle(spark, duck, name, qd):
    df = qd.fn(spark, SF_SMOKE)
    ok, msg = compare(df, duck, qd.oracle)
    assert ok, f"{name}: {msg}"


def test_rows_only_queries_run(spark):
    for name, qd in QUERY_REGISTRY.items():
        if qd.oracle is None:
            n = qd.fn(spark, SF_SMOKE).count()
            assert n >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"c_mktsegment", "revenue_ratio", "net_revenue", "n_items"}
    assert set(e.oracle_sql()) <= set(e.queries())
