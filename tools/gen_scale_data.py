"""Generate a LOCAL scaled twin of the driver's synthetic testdata.

The sf0.1 bench can no longer separate plan cost from Spark's fixed
per-job floor (VERDICT r6: 134/163 queries "weak" purely on toy-scale
denominators). This generator mirrors /root/testdata's schema and value
domains (TESTDATA.md: TPC-H-ish star schema, seed 42) at an arbitrary
scale factor so tools/scale_probe.py can measure how each query's wall
time actually scales — the number that distinguishes a job-floor
artifact (exponent ~0) from a real plan cost (exponent ~1 for linear
work) or a scale-killer (superlinear).

It does NOT touch /root/testdata (read-only) and is NOT an oracle
input: distributions approximate the driver's generator (uniform
categorical domains, same key ranges scaled 10x, same vocab-salad
documents, same 64-dim embeddings), which is all a *scaling* probe
needs. Output: <out_dir>/<table>.parquet, one file per table, matching
the originals' single-file layout so scan parallelism starts equal.

Usage: python tools/gen_scale_data.py [sf] [out_dir]
Defaults: sf=1, out_dir=/tmp/spark_graft_scale/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "a agg batch big column data fast filter group hash join key line merge "
    "order part plan query row scan slow small sort spark stream table value "
    "window шум zh".split()
)[:31]
LANGS = np.array(["en", "de", "es", "fr", "zh"])
LANG_P = np.array([0.41, 0.1475, 0.1475, 0.1475, 0.1475])
EVENT_TYPES = np.array(["click", "error", "purchase", "signup", "view"])
SEGMENTS = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])
PRIORITIES = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
STATUSES = np.array(["F", "O", "P"])
RETFLAGS = np.array(["A", "N", "R"])
LINESTATUS = np.array(["F", "O"])
PTYPES = np.array(["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"])
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA", "FRANCE",
    "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN", "JORDAN", "KENYA",
    "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA", "ROMANIA", "SAUDI ARABIA",
    "VIETNAM", "RUSSIA", "UNITED KINGDOM", "UNITED STATES",
]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def generate(sf: float, out_dir: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_users = int(15_000 * sf)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int64()), "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int64()),
        "n_name": NATIONS,
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int64()),
    }))
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": SEGMENTS[rng.integers(0, 5, n_cust)],
    }))
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))
    sizes = np.array([f"{a} {b}" for a in ("large", "small", "medium", "promo", "econ")
                      for b in ("ring", "box", "case", "bolt")])
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": sizes[rng.integers(0, len(sizes), n_part)],
        "p_brand": np.array([f"Brand#{i}" for i in range(1, 26)])[rng.integers(0, 25, n_part)],
        "p_type": PTYPES[rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900 + (np.arange(n_part) % 1000), 2),
    }))
    day = np.int64(86_400_000_000)  # us
    d0 = np.datetime64("1995-01-01", "us").astype(np.int64)
    odate = d0 + rng.integers(0, 2404, n_ord) * day
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": STATUSES[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(900, 500_000, n_ord), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": PRIORITIES[rng.integers(0, 5, n_ord)],
    }))
    lok = rng.integers(0, n_ord, n_li)
    lok.sort()
    ship = odate[lok] + rng.integers(1, 96, n_li) * day
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(lok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": RETFLAGS[rng.integers(0, 3, n_li)],
        "l_linestatus": LINESTATUS[rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    }))
    t0 = np.datetime64("2024-01-01", "us").astype(np.int64)
    ts = t0 + np.sort(rng.integers(0, 30 * day, n_ev))
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": EVENT_TYPES[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0, 561, n_ev), 2),
        "props": np.char.add(np.char.add('{"k": ', rng.integers(0, 100, n_ev).astype("U3")), "}"),
    }))
    vocab = np.array(VOCAB)
    lens = rng.integers(9, 116, n_doc)
    words = vocab[rng.integers(0, len(vocab), int(lens.sum()))]
    offs = np.concatenate(([0], np.cumsum(lens)))
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n_doc)]
    # plant exact duplicates (~2%) so the dedup family has work at scale
    dup_src = rng.integers(0, n_doc, max(1, n_doc // 50))
    for j, s in enumerate(dup_src):
        texts[(s + 7 * (j + 1)) % n_doc] = texts[s]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": LANGS[rng.choice(5, n_doc, p=LANG_P)],
        "source": np.array([f"src{i}" for i in range(20)])[np.arange(n_doc) % 20],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))
    emb = rng.normal(0, 1, (n_emb, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/spark_graft_scale/sf{sys.argv[1] if len(sys.argv) > 1 else '1'}"
    print(f"generating sf={sf} into {out}")
    generate(sf, out)
