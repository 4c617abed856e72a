"""Per-query probe for optimization rounds: bench-identical session,
min-of-N noop-sink timing for the named queries, optional formatted-plan
dump.

Usage:
    python tools/quiet_probe.py [--plans OUTDIR] [--suffix TAG] [--n N] \
        [--sf SF_DIR] name [name ...]

Timing methodology matches bench.py exactly (warm pass first, then N timed
passes, min per query, noop sink, cache cleared between queries) so numbers
are directly comparable to BENCH_FULL.json. With --plans, each query's
``explain("formatted")`` text is written to OUTDIR/<name>_<suffix>.txt
before timing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipeline_etl_website_visits_spark.session import get_spark
from pipeline_etl_website_visits_spark.queries.registry import REGISTRY
import pipeline_etl_website_visits_spark.queries  # noqa: F401


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans", default=None, help="directory for explain('formatted') dumps")
    ap.add_argument("--suffix", default="before", help="plan filename suffix (before/after)")
    ap.add_argument("--n", type=int, default=3, help="timed passes (min is reported)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    names = list(args.names)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        "quiet-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.codegen.cache.maxEntries": "5000",
            "spark.sql.codegen.maxFields": "300",
            "spark.locality.wait": "0ms",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()

    def run(name: str) -> None:
        spark.sparkContext.setJobDescription(name)
        REGISTRY[name].spark(spark, args.sf).write.format("noop").mode("overwrite").save()
        if not cache_mgr.isEmpty():
            spark.catalog.clearCache()

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in names:
            df = REGISTRY[name].spark(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
            if not cache_mgr.isEmpty():
                spark.catalog.clearCache()

    # warm pass (untimed), then N timed passes, min per query — bench.py's rule
    for name in names:
        run(name)
    timings: dict[str, float] = {}
    for _ in range(args.n):
        for name in names:
            t0 = time.perf_counter()
            run(name)
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
    print(json.dumps({"sf_dir": args.sf, "cpus": int(cpus), "min_of": args.n,
                      "queries": timings, "total": round(sum(timings.values()), 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
