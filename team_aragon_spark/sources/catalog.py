"""Table catalog over the driver's parquet star schema.

Parquet scans are the fast path at scale: Catalyst pushes filters and
column pruning into the reader (verify with ``.explain`` →
``PushedFilters`` / ``ReadSchema``).  Nothing here forces an action;
every accessor returns a lazy DataFrame.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from team_aragon_spark.schemas import STAR_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Columns that MAY be written as parquet TIMESTAMP(NANOS), which
# Spark's vectorized reader rejects outright.  The shim is
# schema-adaptive: we enable legacy.parquet.nanosAsLong (harmless for
# non-nanos files), read the file, and only when the column actually
# surfaced as a raw nanosecond long do we convert it to a microsecond
# timestamp in the plan — a narrow, distributed projection, equivalent
# to a source adapter; no data is rewritten or collected.  Files that
# already store timestamp[us]/[ms] read through untouched, so the
# engine survives upstream writers changing timestamp resolution.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def read_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Lazy parquet scan of one star-schema table."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _NANOS_TS_COLS.get(name, ())
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # Integer `div`, not `/`: epoch nanos (~1.7e18) overflow a
        # double's 53-bit mantissa, so float division corrupts the low
        # microseconds.  Floor division also matches how DuckDB reads
        # TIMESTAMP(NANOS) (truncation), keeping ts values bit-identical
        # between the engine and the oracle.  Applied ONLY when the
        # column read back as LongType (i.e. the file really is nanos);
        # a column already read as a timestamp passes through.
        shims = {
            c: F.timestamp_micros(F.expr(f"`{c}` div 1000"))
            for c in ns_cols
            if isinstance(df.schema[c].dataType, T.LongType)
        }
        return df.withColumns(shims) if shims else df
    return spark.read.parquet(path)


def load_star_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """All star tables as a dict of lazy DataFrames."""
    return {name: read_table(spark, name, sf_dir) for name in STAR_TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every star table as a temp view so users can
    ``spark.sql(...)`` directly — the SQL front door to the engine.
    Views are lazy scans; all Catalyst pushdown/pruning applies to
    queries written against them."""
    for name, df in load_star_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
