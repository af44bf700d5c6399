#!/usr/bin/env python
"""Time named queries with bench.py's exact methodology (noop sink,
N passes, steady = min), isolated from the full bench for A/B work.

    python scripts/time_queries.py q256 q203 [--runs 3] [--sf /root/testdata/sf0.1]
"""
import os
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for i, a in enumerate(sys.argv[1:]):
        if a == "--runs":
            runs = int(sys.argv[2 + i])
            args.remove(sys.argv[2 + i])
        if a == "--sf":
            sf_dir = sys.argv[2 + i]
            args.remove(sf_dir)

    from team_aragon_spark.session import get_spark

    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    def _noop(batches):
        yield from batches

    spark.range(64).repartition(8).mapInPandas(_noop, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    from team_aragon_spark.plans.star_queries import QUERY_REGISTRY

    names = [n for n in QUERY_REGISTRY if any(n.startswith(w) for w in args)]
    for name in names:
        fn = QUERY_REGISTRY[name].fn
        ts = []
        for _ in range(runs):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.monotonic() - t0, 3))
            spark.catalog.clearCache()
        print(f"{name}: steady {min(ts)}s runs {ts}", flush=True)


if __name__ == "__main__":
    main()
