"""The reference's seven report queries (Reporting.py) as pure
parameterized plans over the hospital store.

Each function is ``(spark, store, params) -> DataFrame`` — no
Streamlit, no matplotlib, no collect: presentation stays at the edge
(K4).  Join strategy: quality/hospitals/locations are dimension-sized
→ broadcast; ``hospital_beds`` is the fact and is never shuffled for
a broadcast join.  Week/date equality filters prune parquet
partitions (the store partitions beds by ``collection_week``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from team_aragon_spark.pipeline.sinks import ParquetStore

BED_SUM_COLS = {
    "total_adult_beds": "all_adult_hospital_beds_7_day_avg",
    "total_pediatric_beds": "all_pediatric_inpatient_beds_7_day_avg",
    "total_icu_beds": "total_icu_beds_7_day_avg",
    "icu_beds_used": "icu_beds_used_7_day_avg",
    "covid_beds_used": "inpatient_beds_used_covid_7_day_avg",
}


def _week(col: str, week: str):
    return F.col(col) == F.lit(week).cast("date")


def records_loaded_per_week(spark: SparkSession, store: ParquetStore, week: str) -> DataFrame:
    """Reporting.py:24-45 — count for the selected week plus the
    per-week history strictly before it (A1+A2, F2+F3)."""
    beds = store.read(spark, "hospital_beds")
    return (
        beds.filter(F.col("collection_week") <= F.lit(week).cast("date"))
        .groupBy("collection_week")
        .agg(F.count(F.lit(1)).alias("n_records"))
        .orderBy("collection_week")
    )


def beds_summary_for_week(spark: SparkSession, store: ParquetStore, week: str) -> DataFrame:
    """Reporting.py:48-78 — 5 bed-metric grand totals for one week (A3)."""
    beds = store.read(spark, "hospital_beds")
    return beds.filter(_week("collection_week", week)).agg(
        *[F.round(F.sum(src), 2).alias(alias) for alias, src in BED_SUM_COLS.items()]
    )


def beds_summary_recent_weeks(spark: SparkSession, store: ParquetStore, n_weeks: int = 4) -> DataFrame:
    """Reporting.py:81-110 — same totals for the 4 most recent weeks (A4, T2)."""
    beds = store.read(spark, "hospital_beds")
    return (
        beds.groupBy("collection_week")
        .agg(*[F.round(F.sum(src), 2).alias(alias) for alias, src in BED_SUM_COLS.items()])
        .orderBy(F.col("collection_week").desc())
        .limit(n_weeks)
    )


def fraction_beds_in_use_by_rating(spark: SparkSession, store: ParquetStore, week: str) -> DataFrame:
    """Reporting.py:113-137 — ratio-of-sums by quality rating (J1 + A5).

    NULL semantics preserved: a row where any term of ``a + b`` is NULL
    drops out of that SUM in both SQL and Spark.  The rating-0 group is
    the reference's 'Not Available'→0 quirk surfacing (P6).
    """
    beds = store.read(spark, "hospital_beds").filter(_week("collection_week", week))
    quality = store.read(spark, "hospital_quality")
    used = F.col("icu_beds_used_7_day_avg") + F.col("inpatient_beds_used_covid_7_day_avg")
    avail = F.col("total_icu_beds_7_day_avg") + F.col("all_adult_hospital_beds_7_day_avg")
    return (
        beds.join(F.broadcast(quality), beds.hospital_fk == quality.facility_id)
        .groupBy("hospital_overall_rating")
        .agg(F.round(F.try_divide(F.sum(used), F.sum(avail)), 6).alias("fraction_of_beds_in_use"))
        .orderBy("hospital_overall_rating")
    )


def hospital_cases_by_week(spark: SparkSession, store: ParquetStore, week: str) -> DataFrame:
    """Reporting.py:140-176 — all-cases vs covid-cases sums per week (A6, F4)."""
    beds = store.read(spark, "hospital_beds")
    all_cases = (
        F.col("all_adult_hospital_inpatient_bed_occupied_7_day_coverage")
        + F.col("all_pediatric_inpatient_bed_occupied_7_day_avg")
        + F.col("icu_beds_used_7_day_avg")
    )
    return (
        beds.filter(F.col("collection_week") <= F.lit(week).cast("date"))
        .groupBy("collection_week")
        .agg(
            F.round(F.sum(all_cases), 2).alias("all_cases"),
            F.round(F.sum("inpatient_beds_used_covid_7_day_avg"), 2).alias("covid_cases"),
        )
        .orderBy("collection_week")
    )


def emergency_services_by_state(spark: SparkSession, store: ParquetStore, top_n: int = 20) -> DataFrame:
    """Reporting.py:179-207 — hospitals with emergency services per state,
    top-20 (J2 + A7 + F5 + T4; the reference does nlargest client-side)."""
    quality = store.read(spark, "hospital_quality").filter(F.col("emergency_services"))
    hospitals = store.read(spark, "hospitals")
    locations = store.read(spark, "hospital_locations")
    return (
        quality.join(F.broadcast(hospitals), quality.facility_id == hospitals.hospital_pk)
        .join(F.broadcast(locations), hospitals.hospital_pk == locations.hospital_fk)
        .groupBy("state")
        .agg(F.count(F.lit(1)).alias("n_hospitals"))
        .orderBy(F.col("n_hospitals").desc(), "state")
        .limit(top_n)
    )


def beds_in_use_by_ownership(spark: SparkSession, store: ParquetStore, ownership: str) -> DataFrame:
    """Reporting.py:210-236 — per-week bed-use fraction for one ownership
    type (J3 + A8 + F6)."""
    beds = store.read(spark, "hospital_beds")
    quality = store.read(spark, "hospital_quality").filter(F.col("hospital_ownership") == ownership)
    used = F.col("icu_beds_used_7_day_avg") + F.col("inpatient_beds_used_covid_7_day_avg")
    avail = F.col("total_icu_beds_7_day_avg") + F.col("all_adult_hospital_beds_7_day_avg")
    return (
        beds.join(F.broadcast(quality), beds.hospital_fk == quality.facility_id)
        .groupBy("hospital_ownership", "collection_week")
        .agg(F.round(F.try_divide(F.sum(used), F.sum(avail)), 6).alias("fraction_in_use"))
        .orderBy("hospital_ownership", "collection_week")
    )


def top_and_bottom_rated_states(spark: SparkSession, store: ParquetStore, data_date: str, k: int = 10) -> tuple[DataFrame, DataFrame]:
    """Reporting.py:239-271 — state avg ratings, top-10 and bottom-10
    (J4 + A9 + T5).  The reference computes this client-side in pandas
    (dropna/astype/groupby/sort/head/tail); here it is one plan + two
    top-k reads.  NULL ratings drop via the avg (F8's dropna)."""
    quality = store.read(spark, "hospital_quality").filter(
        F.col("data_date") == F.lit(data_date).cast("date")
    )
    locations = store.read(spark, "hospital_locations")
    by_state = (
        quality.join(F.broadcast(locations), quality.facility_id == locations.hospital_fk)
        .filter(F.col("hospital_overall_rating").isNotNull())
        .groupBy("state")
        .agg(F.round(F.avg("hospital_overall_rating"), 4).alias("avg_rating"))
    )
    top = by_state.orderBy(F.col("avg_rating").desc(), "state").limit(k)
    bottom = by_state.orderBy(F.col("avg_rating").asc(), "state").limit(k)
    return top, bottom
