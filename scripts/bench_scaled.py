#!/usr/bin/env python
"""Opt-in scaled bench lane (r11 VERDICT item 8): time the HEADLINE
set at a larger scale factor with bench.py's exact methodology (noop
sink, 2 passes, steady = min, clearCache between queries) and print
the same one-line JSON.  The default driver contract (bench.py) is
untouched — this lane exists because sf0.1 is scheduling-overhead-
bound (the r11 scaling block: 8 cores beat 32 on every headline
query), so parallelism is only measurable at 100x.

    SPARK_GRAFT_SF_DIR=.scaled/sf10 SPARK_GRAFT_CPUS=32 \
        python scripts/bench_scaled.py [--out BENCH_100X_c32.json] [q24 q42 ...]

Query-name args (prefix match) restrict the set; default is the full
bench.py HEADLINE list.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from bench import HEADLINE
    from team_aragon_spark.plans.star_queries import QUERY_REGISTRY
    from team_aragon_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", ".scaled/sf10")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
        if out in args:
            args.remove(out)
    names = (
        [n for n in HEADLINE if any(n.startswith(a) for a in args)]
        if args
        else list(HEADLINE)
    )

    spark = get_spark("team-aragon-bench-scaled")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    def _noop(batches):
        yield from batches

    spark.range(64).repartition(8).mapInPandas(_noop, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    cold: dict[str, float] = {}
    steady: dict[str, float] = {}
    for name in names:
        fn = QUERY_REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"scaled-bench {name}")
        runs = []
        for _ in range(2):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
        cold[name] = round(runs[0], 3)
        steady[name] = round(min(runs), 3)
        spark.catalog.clearCache()
        print(f"  {name}: cold {cold[name]}s steady {steady[name]}s", file=sys.stderr)

    compact = {
        "metric": "headline_queries_total_wall_steady_scaled",
        "value": round(sum(steady.values()), 3),
        "unit": "sec",
        "queries": steady,
        "cold_total": round(sum(cold.values()), 3),
        "sf_dir": sf_dir,
        "cpus": cpus,
    }
    if out:
        with open(out, "w") as f:
            json.dump(compact, f, indent=1)
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
