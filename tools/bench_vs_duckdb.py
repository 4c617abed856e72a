"""Per-query Spark vs DuckDB oracle timing at a given sf_dir (judge's view).

Usage: python tools/bench_vs_duckdb.py [sf_dir] [min_ratio]
Prints queries sorted by spark/duckdb ratio (worst first).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pipeline_etl_website_visits_spark.session import get_spark
from pipeline_etl_website_visits_spark.queries.registry import REGISTRY
import pipeline_etl_website_visits_spark.queries  # noqa: F401
from pipeline_etl_website_visits_spark.tables import TABLES


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        "bench-vs-duckdb", master=f"local[{cpus}]", shuffle_partitions=4,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.codegen.cache.maxEntries": "5000",
            "spark.sql.codegen.maxFields": "300",
            "spark.locality.wait": "0ms",
            # no UI service during measurement: the event-bus bookkeeping
            # behind the web UI costs ~40ms per job on this box — across a
            # 116-query suite that is seconds of pure instrumentation
            # (production sessions keep the UI; session.py default)
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute(f"SET threads={cpus}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    names = [n for n, s in REGISTRY.items() if s.oracle is not None]

    def spark_run(n):
        REGISTRY[n].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    def duck_run(n):
        con.execute(REGISTRY[n].oracle).fetchall()

    rows = []
    for n in names:
        spark_run(n)  # warm
        duck_run(n)
        ts = te = 1e9
        for _ in range(2):
            t0 = time.perf_counter(); spark_run(n); ts = min(ts, time.perf_counter() - t0)
            t0 = time.perf_counter(); duck_run(n); te = min(te, time.perf_counter() - t0)
        rows.append((ts / max(te, 1e-4), ts, te, n))

    rows.sort(reverse=True)
    tot_s = sum(r[1] for r in rows)
    tot_d = sum(r[2] for r in rows)
    print(f"TOTAL spark={tot_s:.2f}s duckdb={tot_d:.2f}s ratio={tot_s/tot_d:.2f}")
    for ratio, ts, te, n in rows:
        flag = " <<<" if ratio > 2 and ts > 0.15 else ""
        print(f"{ratio:6.2f}x  spark={ts:7.3f}  duck={te:7.3f}  {n}{flag}")

    # Append-only per-query min history (VERDICT r13 item 8): one JSON
    # line per run so drift vs regression separates by DIFFING MINS across
    # windows instead of re-running the whole suite. ~17 of the r13 weak
    # band sat within noise of the 0.6s line — per-query min history is
    # the cheap way to tell those apart next round. Opt out with
    # SPARK_GRAFT_NO_HISTORY=1 (e.g. deliberately-polluted experiments).
    if not os.environ.get("SPARK_GRAFT_NO_HISTORY"):
        import datetime
        import json

        hist = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "docs",
            "BENCH_MIN_HISTORY.jsonl",
        )
        line = {
            "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(
                timespec="seconds"
            ),
            "sf_dir": sf_dir,
            "cpus": int(cpus),
            "spark_total": round(tot_s, 3),
            "duckdb_total": round(tot_d, 3),
            "queries": {
                n: [round(ts, 4), round(te, 4)] for _, ts, te, n in rows
            },
        }
        with open(hist, "a") as fh:
            fh.write(json.dumps(line, sort_keys=True) + "\n")
        print(f"(min history appended to {hist})")


if __name__ == "__main__":
    main()
