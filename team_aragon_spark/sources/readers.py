"""Typed CSV readers for the reference pipeline's inputs (SURVEY.md §2.A).

The reference infers types with pandas (``load_hhs.py:46``) or reads
everything as string (``load_quality.py:99``).  Here every scan gets a
declared schema — at 100 TB, ``inferSchema`` means one extra full pass
over the data and nondeterministic types across batches.

Only consumed columns are selected; Catalyst pushes the projection
into the CSV parser so unparsed columns are skipped, which is the
distributed equivalent of the reference's ``usecols``
(``load_quality.py:98``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from team_aragon_spark.operators.cleaning import (
    add_literal_column,
    normalize_column_names,
    parse_dates,
    remap_values,
    sentinel_to_null,
)
from team_aragon_spark.schemas import CMS_CONSUMED_COLS, HHS_BED_METRIC_COLS, HHS_CONSUMED_SCHEMA

HHS_SENTINEL = -999999.0


def read_hhs_csv(spark: SparkSession, path: str) -> DataFrame:
    """Raw HHS weekly CSV → typed 17-column DataFrame (operator S1).

    ``'NA'`` is the file's null encoding (``load_hhs.py:46`` relies on
    pandas' default NA parsing); numeric metric columns carry the
    ``-999999`` suppression sentinel, handled downstream by
    ``clean_hhs`` so validation order matches the reference.
    """
    raw = spark.read.csv(path, header=True, nullValue="NA", quote='"', escape='"')
    return raw.select(
        *[F.col(f.name).cast(f.dataType) for f in HHS_CONSUMED_SCHEMA.fields]
    )


def clean_hhs(df: DataFrame) -> DataFrame:
    """Sentinel→NULL (P4) then date parse (P11), in the reference's order
    (``load_hhs.py:49-53``): sentinels must become NULL *before* F1
    range validation treats them as negatives."""
    df = sentinel_to_null(df, HHS_SENTINEL, HHS_BED_METRIC_COLS)
    return parse_dates(df, ["collection_week"])


def read_cms_csv(spark: SparkSession, path: str) -> DataFrame:
    """Raw CMS quality CSV → 5 consumed columns, all-string (operator S2,
    ``load_quality.py:98-99``)."""
    raw = spark.read.csv(path, header=True, quote='"', escape='"')
    return normalize_column_names(raw.select(*[F.col(c) for c in CMS_CONSUMED_COLS]))


def clean_cms(df: DataFrame, data_date: str) -> DataFrame:
    """The quality loader's remap/cast chain (P3, P6, P7, P9, P11, P12 —
    ``load_quality.py:102-107``), including the reference's deliberate
    quirk: ``'Not Available'`` rating becomes **0.0**, not NULL."""
    df = remap_values(df, "hospital_overall_rating", {"Not Available": "0"})
    df = df.withColumn("hospital_overall_rating", F.col("hospital_overall_rating").cast("double"))
    df = remap_values(df, "emergency_services", {"Yes": True, "No": False}, keep_unmapped=False)
    df = df.withColumn("emergency_services", F.col("emergency_services").cast("boolean"))
    df = add_literal_column(df, "data_date", data_date, "date")
    return df.select(
        "facility_id",
        "hospital_overall_rating",
        "emergency_services",
        "hospital_type",
        "hospital_ownership",
        "data_date",
    )
