"""Deterministic per-query Spark JOB COUNT probe (optimization evidence).

Wall-clock on this VM swings ±30-400% with hypervisor steal; the number of
jobs a warm query schedules is load-independent and is the primary evidence
for fixed-cost removals (OPTIMIZATION_r14 methodology, now a committed tool
instead of an ad-hoc harness). Counts jobs via the driver's nextJobId delta
around the SECOND run of each query (the first run pays one-time artifact
builds / memo fills that a warm serving process never re-pays).

Usage:
    python tools/job_probe.py [--sf SF_DIR] name [name ...]
    python tools/job_probe.py --all          # survey the whole registry
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipeline_etl_website_visits_spark.session import get_spark
from pipeline_etl_website_visits_spark.queries.registry import REGISTRY
import pipeline_etl_website_visits_spark.queries  # noqa: F401


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true", help="survey every registered query")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    names = sorted(REGISTRY) if args.all else list(args.names)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        "job-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
            "spark.locality.wait": "0ms",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    sc = spark.sparkContext._jsc.sc()

    def run(name: str) -> int:
        before = sc.dagScheduler().nextJobId()
        REGISTRY[name].spark(spark, args.sf).write.format("noop").mode("overwrite").save()
        after = sc.dagScheduler().nextJobId()
        if not cache_mgr.isEmpty():
            spark.catalog.clearCache()
        return int(after - before)

    counts: dict[str, int] = {}
    for name in names:
        run(name)  # cold run: artifact builds / memo fills excluded
        counts[name] = run(name)  # warm job count — the serving number
    print(json.dumps({"sf_dir": args.sf, "cpus": int(cpus), "jobs": counts}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
