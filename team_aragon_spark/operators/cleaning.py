"""Row-transform cleaning operators (SURVEY.md §2.B, P3-P12).

Each operator is a pure ``DataFrame -> DataFrame`` function built from
JVM-side expressions only — no Python UDFs — so the whole cleaning
stage stays inside one WholeStageCodegen span and costs one scan at
any scale.  The reference does the same work row-at-a-time in pandas
(``load_hhs.py:46-53``, ``load_quality.py:98-107``).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sentinel_to_null(df: DataFrame, sentinel: float, cols: Iterable[str]) -> DataFrame:
    """Replace a numeric sentinel (e.g. -999999 = "suppressed") with NULL.

    Reference: ``load_hhs.py:49`` (P4).  Must run *before* range
    validation so sentinels are treated as missing, not negative
    (SURVEY.md F1 ordering note).
    """
    return df.withColumns(
        {c: F.when(F.col(c) == F.lit(sentinel), F.lit(None)).otherwise(F.col(c)) for c in cols}
    )


def normalize_column_names(df: DataFrame) -> DataFrame:
    """Lowercase + spaces→underscores on all column names.

    Reference: ``load_quality.py:102`` (P3).
    """
    return df.toDF(*[c.lower().replace(" ", "_") for c in df.columns])


def remap_values(df: DataFrame, col: str, mapping: Mapping[object, object], keep_unmapped: bool = True) -> DataFrame:
    """Constant value remap, e.g. ``'Not Available' -> '0'`` or ``'Yes' -> True``.

    Reference: ``load_quality.py:103-105`` (P6, P7).  With
    ``keep_unmapped=False`` unmapped values become NULL (the bool remap
    semantics); otherwise they pass through (the rating remap).
    """
    expr: Column = F.lit(None)
    if keep_unmapped:
        expr = F.col(col)
    for k, v in reversed(list(mapping.items())):
        expr = F.when(F.col(col) == F.lit(k), F.lit(v)).otherwise(expr)
    return df.withColumn(col, expr)


def cast_columns(df: DataFrame, types: Mapping[str, str]) -> DataFrame:
    """Explicit cast; malformed input becomes NULL (Spark cast semantics).

    Replaces the reference's accidental best-effort
    ``astype(float, errors='ignore')`` (``load_hhs.py:52``, P8 — which
    silently left 95/127 columns untyped) and pandas
    ``to_numeric(errors='coerce')`` (``Reporting.py:256``, P10) with
    one deliberate behavior: declared type, NULL on error.
    ``try_cast``, not ``cast``: Spark 4's default ANSI mode makes a
    plain cast RAISE on malformed input, which would abort a whole
    load batch on one bad cell.
    """
    return df.withColumns({c: F.col(c).try_cast(t) for c, t in types.items()})


def parse_dates(df: DataFrame, cols: Iterable[str], fmt: str = "yyyy-MM-dd") -> DataFrame:
    """String → DateType, NULL on unparseable input (try_to_date; a
    plain to_date raises under ANSI mode).  Reference:
    ``load_hhs.py:53`` (P11)."""
    return df.withColumns({c: F.try_to_date(F.col(c), fmt) for c in cols})


_WKT_POINT = r"^\s*POINT\s*\(\s*(-?[0-9.eE+]+)\s+(-?[0-9.eE+]+)\s*\)\s*$"


def parse_wkt_point(
    df: DataFrame,
    col: str = "geocoded_hospital_address",
    lon_col: str = "longitude",
    lat_col: str = "latitude",
) -> DataFrame:
    """Extract lon/lat doubles from a WKT ``POINT (lon lat)`` string.

    The reference stores ``geocoded_hospital_address`` as the raw WKT
    text and nothing ever reads it back (``load_hhs.py:90-91`` inserts
    it; no report queries it) — the coordinates are dead on arrival.
    Here the point is parsed at load time into two double columns, so
    geo filters/joins are plain numeric predicates that Catalyst can
    push into the parquet scan.  Malformed or NULL WKT yields NULL
    coordinates (one regexp pass, ``try_cast`` for the numeric edge);
    the raw string column is preserved for parity.
    """
    lon = F.regexp_extract(F.col(col), _WKT_POINT, 1)
    lat = F.regexp_extract(F.col(col), _WKT_POINT, 2)
    return df.withColumns(
        {
            lon_col: F.when(lon != "", lon).try_cast("double"),
            lat_col: F.when(lat != "", lat).try_cast("double"),
        }
    )


def add_literal_column(df: DataFrame, name: str, value, dtype: str | None = None) -> DataFrame:
    """Broadcast a constant to all rows (e.g. the CLI-supplied batch date).

    Reference: ``load_quality.py:107`` (P12).
    """
    col = F.lit(value)
    if dtype:
        col = col.cast(dtype)
    return df.withColumn(name, col)
