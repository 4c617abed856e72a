"""Measure mad_outliers exact vs approx at two scale factors.

The ``exact=False`` knob (approx_percentile sketches instead of two
exact-order-statistic passes) is the documented 100 TB escape hatch for
the robust-median audit; this probe turns its claimed benefit into a
measured number (VERDICT r7 item 7). Runs the SAME events-table audit
x143 performs, both paths, on the twin corpora, and prints one JSON
line for docs/SCALE.md.

Usage: python tools/mad_probe.py [small_dir] [big_dir]
Defaults: /tmp/spark_graft_scale/sf0.1x /tmp/spark_graft_scale/sf1
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipeline_etl_website_visits_spark.session import get_spark
from pipeline_etl_website_visits_spark.operators.timeseries import mad_outliers
from pipeline_etl_website_visits_spark.tables import load_table


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/sf0.1x"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_scale/sf1"
    spark = get_spark(
        "mad-probe",
        master=f"local[{os.cpu_count()}]",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
            "spark.locality.wait": "0ms",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(sf_dir: str, exact: bool) -> float:
        # the exact x143 shape: events.(event_type, value), k=3
        ev = load_table(spark, sf_dir, "events").select("event_type", "value")
        best = math.inf
        for i in range(3):  # pass 0 = warm
            t0 = time.perf_counter()
            mad_outliers(ev, exact=exact).write.format("noop").mode(
                "overwrite"
            ).save()
            if i:
                best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    out = {}
    for sf_dir, key in ((small, "sf0.1x"), (big, "sf1")):
        out[key] = {
            "exact_sec": run(sf_dir, True),
            "approx_sec": run(sf_dir, False),
        }
        out[key]["speedup"] = round(
            out[key]["exact_sec"] / out[key]["approx_sec"], 2
        )
    print(json.dumps({"small": small, "big": big, "results": out}))


if __name__ == "__main__":
    main()
