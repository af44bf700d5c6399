#!/usr/bin/env python
"""Foreground 100x ledger measurement: fresh JVM, noop sink, two
passes per query (cold + steady; PLANS.md records the steady min).

    python scripts/measure_100x.py q193_mann_whitney_utest q209_...

Run with NOTHING else on the box (background runs read ~40% slow).
"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from team_aragon_spark.session import get_spark
from team_aragon_spark.plans.star_queries import QUERY_REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", ".scaled/sf10")
spark = get_spark("measure-100x")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1).count()

def _noop(batches):
    yield from batches

spark.range(64).repartition(8).mapInPandas(_noop, schema="id long").write.format(
    "noop").mode("overwrite").save()

for name in sys.argv[1:]:
    fn = QUERY_REGISTRY[name].fn
    runs = []
    for _ in range(2):
        t0 = time.monotonic()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        runs.append(round(time.monotonic() - t0, 2))
    spark.catalog.clearCache()
    print(f"{name}: cold {runs[0]}s steady {min(runs)}s", flush=True)
