"""Benchmark runner — prints ONE JSON line consumed by the driver.

Runs every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], warm-session timing
(JVM/session startup excluded, one untimed warmup pass of q01 to load
classes and prime the FS listing cache). Per-query seconds land in
"queries"; "value" is the sum.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pipeline_etl_website_visits_spark.session import get_spark
from pipeline_etl_website_visits_spark.queries.registry import REGISTRY
import pipeline_etl_website_visits_spark.queries  # noqa: F401


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(
        "pipeline-etl-website-visits-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: exclude JVM class loading + codegen compilation from timings.
    REGISTRY["q01_scan_project_rename"].spark(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        t0 = time.perf_counter()
        n = spec.spark(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        _ = n

    print(
        json.dumps(
            {
                "metric": "declared_query_suite_wall_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
