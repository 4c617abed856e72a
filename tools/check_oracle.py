"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB over the same
parquet tables, then compares row count, column-name set, and an
order-insensitive canonical value comparison (columns sorted by name, rows
sorted). Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pipeline_etl_website_visits_spark.session import get_spark
from pipeline_etl_website_visits_spark.queries.registry import REGISTRY
import pipeline_etl_website_visits_spark.queries  # noqa: F401
from pipeline_etl_website_visits_spark.tables import TABLES


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon_value(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or sorted(REGISTRY)
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name in names:
        spec = REGISTRY[name]
        try:
            sdf = spec.spark(spark, sf_dir)
            srows = sdf.collect()
            scols = [c.lower() for c in sdf.columns]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        # the DRIVER canonicalizes via pandas sort_values over all columns,
        # which dies on unhashable cells (TypeError: unhashable type:
        # 'list') — the exact trap that cost x106 a round-4 gate row while
        # this replica's list-aware canon_value masked it. Fail loudly
        # here instead. DELIBERATELY oracle-backed-only: the driver's
        # rows-only path does not value-canonicalize (x37 emits an array
        # column and has two green rows-only gate rows), so flagging
        # rows-only queries would be a false positive.
        nonscalar = [
            f.name
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if nonscalar:
            failures.append(name)
            print(
                f"FAIL {name}: oracle-backed query emits non-scalar columns "
                f"{nonscalar} — the driver's pandas canonicalizer cannot hash "
                "them; emit a joined string (the q56/x106 convention)"
            )
            continue
        try:
            ores = con.execute(spec.oracle)
            ocols = [d[0].lower() for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if not problems:
            s_canon = canon_rows(scols, [[r[i] for i in range(len(scols))] for r in srows])
            o_canon = canon_rows(ocols, orows)
            if s_canon != o_canon:
                diff = next(
                    (i, a, b) for i, (a, b) in enumerate(zip(s_canon, o_canon)) if a != b
                )
                problems.append(f"values differ at sorted-row {diff[0]}:\n  spark : {diff[1]}\n  duckdb: {diff[2]}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(srows)} rows match")
    print(f"\n{len(names) - len(failures)}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
