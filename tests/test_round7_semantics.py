"""Planted-input semantics pins for the round-7 operational queries.

The DuckDB oracle rows prove value equality on the generated corpus;
these tests prove the SEMANTICS on inputs constructed to exercise the
interesting cases (a single flipped row, every live IVM quadrant, a
planted seasonal spike) — the cases the corpus may not contain.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from team_aragon_spark.plans.star_queries import QUERY_REGISTRY
from team_aragon_spark.sources.catalog import read_table

from tests.conftest import SF_SMOKE

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _stage_events(spark, tmp_path_factory, rows_or_df, name):
    out = tmp_path_factory.mktemp(name)
    df = (
        rows_or_df
        if not isinstance(rows_or_df, list)
        else spark.createDataFrame(rows_or_df, EVENTS_SCHEMA)
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(out / "events.parquet"))
    return str(out)


def test_partition_checksum_detects_single_row_change(
    spark, tmp_path_factory
):
    """Flipping ONE field of ONE row must change exactly that day's
    digest and no other — the property that makes per-partition
    digests usable as a replication diff."""
    base = read_table(spark, "events", SF_SMOKE).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props"
    )
    dir_a = _stage_events(spark, tmp_path_factory, base, "ck_a")
    mutated = base.withColumn(
        "value",
        F.when(F.col("event_id") == 0, F.col("value") + 1.0).otherwise(
            F.col("value")
        ),
    )
    dir_b = _stage_events(spark, tmp_path_factory, mutated, "ck_b")

    fn = QUERY_REGISTRY["q169_partition_checksums"].fn
    da = {r.day: (r.n_rows, r.digest) for r in fn(spark, dir_a).collect()}
    db = {r.day: (r.n_rows, r.digest) for r in fn(spark, dir_b).collect()}
    assert set(da) == set(db)
    changed_day = (
        base.filter(F.col("event_id") == 0)
        .select(F.to_date(F.date_trunc("day", "ts")))
        .collect()[0][0]
    )
    diff = [d for d in da if da[d] != db[d]]
    assert diff == [changed_day]
    assert da[changed_day][0] == db[changed_day][0]  # count same, digest not


def test_delta_join_ivm_quadrants_planted(spark, tmp_path_factory):
    """Every LIVE quadrant of the q170 decomposition on a constructed
    event set.  Note the 'de' (delta-error x base-click) quadrant is
    provably EMPTY for this temporal join — a click joins only at
    click_ts >= error_ts, so a click older than the cutoff cannot
    follow an error newer than it; the planted set pins the three
    live quadrants and the no-match exclusion."""
    base_t = datetime.datetime(2024, 6, 1, 0, 0, 0)

    def ts(days, hours=0):
        return base_t + datetime.timedelta(days=days, hours=hours)

    # max ts = day 10 => cutoff = day 3
    rows = [
        # user 1: error+click both before cutoff, within 1 day -> 'old'
        (1, ts(0), 1, "error", 0.0, "{}"),
        (2, ts(0, 5), 1, "click", 0.0, "{}"),
        # user 2: error just before cutoff, click after it, within 1d -> 'dc'
        (3, ts(2, 20), 2, "error", 0.0, "{}"),
        (4, ts(3, 6), 2, "click", 0.0, "{}"),
        # user 3: both after cutoff, within 1 day -> 'dd'
        (5, ts(8), 3, "error", 0.0, "{}"),
        (6, ts(8, 3), 3, "click", 0.0, "{}"),
        # user 4: click 2 days after error -> excluded entirely
        (7, ts(4), 4, "error", 0.0, "{}"),
        (8, ts(6), 4, "click", 0.0, "{}"),
        # pin max(ts) so the cutoff lands at day 3
        (9, ts(10), 5, "signup", 0.0, "{}"),
    ]
    d = _stage_events(spark, tmp_path_factory, rows, "ivm")
    got = {
        (r.user_id, r.error_id, r.click_id, r.src)
        for r in QUERY_REGISTRY["q170_delta_join_view_maintenance"]
        .fn(spark, d)
        .collect()
    }
    spark.catalog.clearCache()
    assert got == {
        (1, 1, 2, "old"),
        (2, 3, 4, "dc"),
        (3, 5, 6, "dd"),
    }


def test_seasonal_anomaly_planted_spike(spark, tmp_path_factory):
    """A 50x spike at one (type, hour-of-day) cell must be flagged
    against its OWN hour-of-day baseline while every regular cell
    stays quiet — and the spike must NOT drag other hours' baselines
    (the property q124's global z-score lacks)."""
    base_t = datetime.datetime(2024, 6, 1, 0, 0, 0)
    rows = []
    eid = 0
    # 30 days x 24 hours, one click per hour.  30 matters: the spike
    # sits INSIDE its own baseline, and with n samples a single
    # outlier's z-score is bounded by (n-1)/sqrt(n) — under 3 until
    # n >= 11, comfortably past it at 30 (z ~= 5.3 here).
    for day in range(30):
        for hour in range(24):
            rows.append(
                (
                    eid,
                    base_t + datetime.timedelta(days=day, hours=hour),
                    1,
                    "click",
                    0.0,
                    "{}",
                )
            )
            eid += 1
    # spike: +50 extra events at day 5, 03:00
    for i in range(50):
        rows.append(
            (
                eid,
                base_t + datetime.timedelta(days=5, hours=3, seconds=i),
                1,
                "click",
                0.0,
                "{}",
            )
        )
        eid += 1
    d = _stage_events(spark, tmp_path_factory, rows, "spike")
    out = QUERY_REGISTRY["q171_seasonal_residual_anomaly"].fn(spark, d).collect()
    spark.catalog.clearCache()
    flagged = {(r.event_type, r.hour) for r in out if r.is_anomaly == 1}
    assert flagged == {
        ("click", base_t + datetime.timedelta(days=5, hours=3))
    }
