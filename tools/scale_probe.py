"""Scaling probe: measure per-query wall time at two scale factors and
report the scaling exponent.

The sf0.1 bench ratio conflates plan cost with Spark's fixed per-job
floor (~0.1-0.3s of scheduling per job against DuckDB's ms-scale
denominators). This probe runs each query on the generated twins
(tools/gen_scale_data.py) at sf0.1 and sf1 — same distributions, 10x
the rows — and reports exponent = log10(t_sf1 / t_sf0.1):

- ~0.0  → job-floor bound (wall time barely moves with 10x data; the
  ">2x vs DuckDB" label at sf0.1 is a fixed-overhead artifact)
- ~1.0  → linear in data (the plan's work scales with the input — the
  healthy shape for scans/folds/shuffles)
- >1.3 → superlinear: investigate the plan before trusting it at 100 TB.

Usage: python tools/scale_probe.py [small_dir] [big_dir] [names...]
Defaults: /tmp/spark_graft_scale/sf0.1x /tmp/spark_graft_scale/sf1 and
the round-7 probe set (the 10 VERDICT-r6 weak queries + the dedup/ANN
family). Prints one JSON line; paste the table into docs/SCALE.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipeline_etl_website_visits_spark.session import get_spark
from pipeline_etl_website_visits_spark.queries.registry import REGISTRY
import pipeline_etl_website_visits_spark.queries  # noqa: F401

PROBE_SET = [
    # VERDICT r6 weak band (>2x AND >=0.6s at sf0.1)
    "x140_market_basket_pairs",
    "x123_native_recursion",
    "x92_heavy_hitters",
    "x82_embed_pq_codes",
    "x143_mad_outliers",
    "x127_large_volume_orders",
    "x81_market_share",
    "x117_stored_index_search",
    "x80_product_profit",
    "x108_scd2_asof_lookup",
    # dedup / ANN family (the 100 TB headliners)
    "x21_dedup_exact",
    "x22_dedup_ngram_jaccard",
    "x56_dedup_containment",
    "x85_incremental_dedup",
    "x84_embed_pq_adc_topk",
    "x101_semantic_decontam",
    "x106_label_centroids",
]


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/sf0.1x"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_scale/sf1"
    names = sys.argv[3:] or PROBE_SET
    spark = get_spark(
        "scale-probe",
        master=f"local[{os.cpu_count()}]",
        # production-profile confs (AQE ON): the probe asks how the plan
        # behaves at scale, not how to shave the toy-scale job floor
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
            "spark.locality.wait": "0ms",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()

    def run(name: str, sf_dir: str) -> None:
        REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        if not cache_mgr.isEmpty():
            spark.catalog.clearCache()

    out: dict[str, dict] = {}
    for sf_dir, key in ((small, "t_small"), (big, "t_big")):
        for name in names:  # warm pass
            run(name, sf_dir)
        for name in names:
            best = math.inf
            for _ in range(2):
                t0 = time.perf_counter()
                run(name, sf_dir)
                best = min(best, time.perf_counter() - t0)
            out.setdefault(name, {})[key] = round(best, 3)
    for name, r in out.items():
        r["exponent"] = round(math.log10(r["t_big"] / r["t_small"]), 2)
    print(json.dumps({"small": small, "big": big, "results": out}))


if __name__ == "__main__":
    main()
