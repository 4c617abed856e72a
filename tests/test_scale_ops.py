"""Scale-mechanism tests: salting equivalence + bucketed shuffle-free joins."""

import pyspark.sql.functions as F
import pytest

from pipeline_etl_website_visits_spark.operators.skew import salted_count, salted_join
from pipeline_etl_website_visits_spark.plans import simple_plan


@pytest.fixture()
def skewed(spark):
    # one hot key (90%) + long tail — the shape salting exists for
    rows = [("hot" if i % 10 else f"tail{i}", i) for i in range(5000)]
    return spark.createDataFrame(rows, "k string, v long")


def test_salted_count_equals_plain(spark, skewed):
    plain = {r["k"]: r["count"] for r in skewed.groupBy("k").count().collect()}
    salted = {r["k"]: r["count"] for r in salted_count(skewed, "k", "v", buckets=16).collect()}
    assert salted == plain


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame([("hot", "H")] + [(f"tail{i}", "T") for i in range(0, 5000, 10)], "k string, label string")
    plain = sorted((r["k"], r["v"], r["label"]) for r in skewed.join(dim, "k").collect())
    salted = sorted((r["k"], r["v"], r["label"]) for r in salted_join(skewed, dim, "k", "v", buckets=8).collect())
    assert salted == plain


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Bucketing both sides of the visitantes merge key removes the shuffle —
    the 100 TB design for repeated upserts (docs/SCALE.md)."""
    emails = spark.range(2000).select(
        F.concat(F.lit("u"), F.col("id")).alias("email"), F.col("id").alias("n")
    )
    spark.sql("DROP TABLE IF EXISTS vis_bucketed_a")
    spark.sql("DROP TABLE IF EXISTS vis_bucketed_b")
    for name in ("vis_bucketed_a", "vis_bucketed_b"):
        (
            emails.write.format("parquet")
            .bucketBy(8, "email")
            .sortBy("email")
            .mode("overwrite")
            .saveAsTable(name)
        )
    a = spark.table("vis_bucketed_a")
    b = spark.table("vis_bucketed_b")
    joined = a.join(b, "email")
    plan = simple_plan(joined)
    assert joined.count() == 2000
    # bucketed SMJ: no Exchange on either side
    assert "Exchange hashpartitioning" not in plan
    spark.sql("DROP TABLE IF EXISTS vis_bucketed_a")
    spark.sql("DROP TABLE IF EXISTS vis_bucketed_b")


def test_driver_state_guards_raise(spark):
    """The 100 TB contract for driver-side state is enforced, not commented:
    an oversized cosine_topk query set or kmeans/ivf centroid matrix raises
    before any driver collect/broadcast can OOM."""
    import pytest

    from pipeline_etl_website_visits_spark.operators import similarity as S

    # direct guard: 2M x 1024-dim doubles = 16 GiB >> 64 MiB bound
    with pytest.raises(ValueError, match="broadcast bound"):
        S._guard_driver_bytes("cosine_topk query set", 2_000_000, 1024)
    # boundary: exactly at the bound passes
    S._guard_driver_bytes("ok", S.MAX_DRIVER_STATE_BYTES // 8, 1)

    # end-to-end: a query side over the dim-aware row bound fails fast
    # (bounded limit-collect — no full materialization on the driver).
    # dim=8192 makes the bound 1024 rows, so the fixture stays tiny.
    dim = 8192
    max_q = S.MAX_DRIVER_STATE_BYTES // (8 * dim)
    big = spark.range(max_q + 10).select(
        F.col("id").alias("vec_id"), F.array_repeat(F.lit(1.0), dim).alias("embedding")
    )
    with pytest.raises(ValueError, match="query set exceeds"):
        S.cosine_topk(big, big, k=2)


# ---------------------------------------------------------------------------
# Scale-proof (VERDICT r3 item 7): the dedup family's plan SHAPE must be
# invariant in corpus size — same exchange count at 1x and 10x documents.
# Wall-clock grows with data; a new shuffle appearing at scale would be a
# regression of the 100 TB claims (inverted index, banded LSH, one-shuffle
# aggregations). Synthetic corpus built in-test; /root/testdata untouched.
# ---------------------------------------------------------------------------


def _synthetic_docs(spark, n_docs: int):
    """Deterministic corpus: ~24 words/doc from a 50-doc cycling vocabulary,
    so every 50th doc is an exact near-dup cluster seed at any scale."""
    words = [
        F.md5(F.concat((F.col("id") % 50).cast("string"), F.lit(f"w{j}"))).substr(1, 6)
        for j in range(24)
    ]
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
    )


def _exchange_count(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "ReusedExchange" not in line
    )


def test_dedup_family_plan_shape_flat_at_10x(spark):
    """gram_index-composed Jaccard + containment + MinHash-LSH plans have
    IDENTICAL exchange counts on a 10x larger corpus (static planner: AQE
    and broadcast off, so toy-scale broadcast conversion cannot mask a
    scale-dependent shuffle)."""
    from pipeline_etl_website_visits_spark.operators import dedup as D

    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        counts = {}
        for label, n in (("1x", 300), ("10x", 3000)):
            docs = _synthetic_docs(spark, n)
            counts[label] = {
                "jaccard": _exchange_count(
                    D.shingle_jaccard_pairs(docs, "text", "doc_id", threshold=0.5)
                ),
                "containment": _exchange_count(
                    D.shingle_containment_pairs(docs, "text", "doc_id", threshold=0.5)
                ),
                "jaccard_capped": _exchange_count(
                    D.shingle_jaccard_pairs(
                        docs, "text", "doc_id", threshold=0.5, max_doc_freq=100
                    )
                ),
                "minhash_lsh": _exchange_count(
                    D.minhash_lsh_pairs(docs, "text", "doc_id", verify_threshold=0.5)
                ),
                "exact": _exchange_count(D.dedup_exact(docs, "text", "doc_id")),
            }
        assert counts["10x"] == counts["1x"], counts
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_dedup_clusters_correct_at_10x(spark):
    """End-to-end clusters on the 10x corpus: every 50-doc identity class
    collapses to one cluster labeled by its min doc_id — the iterative
    operator converges at scale with the same per-iteration shuffle shape."""
    from pipeline_etl_website_visits_spark.operators import dedup as D

    docs = _synthetic_docs(spark, 3000)
    pairs = D.shingle_jaccard_pairs(docs, "text", "doc_id", threshold=0.9)
    labels = {r["doc_id"]: r["cluster_id"] for r in D.dedup_clusters(pairs).collect()}
    assert len(labels) == 3000
    for doc_id, cluster in labels.items():
        assert cluster == doc_id % 50


def _synthetic_embeddings(spark, n_vecs: int, dim: int = 64):
    """Deterministic embeddings: 64 hash-derived floats in [0, 1) per id."""
    comps = [
        (F.xxhash64((F.col("id") * dim + j).cast("string")) % 10000 / 10000.0).cast("float")
        for j in range(dim)
    ]
    return spark.range(n_vecs).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
    )


def test_pq_family_plan_shape_flat_at_10x(spark):
    """pq_encode stays a zero-Exchange map pass and pq_adc_topk keeps
    exactly its one final-top-k window exchange at 10x the vectors — a new
    shuffle appearing with scale would break the compressed-domain search
    contract (codebook/tables in the closure, partial top-k per partition)."""
    from pipeline_etl_website_visits_spark.operators import similarity as S

    counts = {}
    for label, n in (("1x", 200), ("10x", 2000)):
        vecs = _synthetic_embeddings(spark, n)
        enc = S.pq_encode(vecs)
        queries = vecs.filter(F.col("vec_id") < 5)
        adc = S.pq_adc_topk(queries, vecs, k=3)
        counts[label] = (_exchange_count(enc), _exchange_count(adc))
    assert counts["1x"] == counts["10x"], counts
    assert counts["1x"][0] == 0  # encode: map-only, no exchange at any scale


def test_pq_adc_agrees_with_exact_quantized_l2_at_10x(spark):
    """ADC distance for the TRUE nearest code must equal the exact
    quantized-subspace distance recomputed in numpy — at 10x scale, across
    every (query, candidate) pair returned."""
    import numpy as np
    from pipeline_etl_website_visits_spark.operators import similarity as S

    vecs = _synthetic_embeddings(spark, 2000)
    queries = vecs.filter(F.col("vec_id") < 3)
    out = S.pq_adc_topk(queries, vecs, k=3).collect()
    assert len(out) == 9

    rows = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in vecs.filter(F.col("vec_id") < 20).collect()}
    # recompute ADC for pairs whose candidate we have locally (ids < 20)
    all_rows = {r["vec_id"]: r for r in vecs.collect()}
    cents = np.stack([
        np.floor(np.asarray(all_rows[i]["embedding"], dtype=np.float64) * 1e6).astype(np.int64)
        for i in range(16)
    ]).reshape(16, 8, 8)
    for r in out:
        q = np.floor(np.asarray(all_rows[r["query_id"]]["embedding"], dtype=np.float64) * 1e6).astype(np.int64).reshape(8, 8)
        c = np.floor(np.asarray(all_rows[r["vec_id"]]["embedding"], dtype=np.float64) * 1e6).astype(np.int64).reshape(8, 8)
        dtab = ((q[None, :, :] - cents) ** 2).sum(axis=2)  # [16, 8]
        codes = ((c[None, :, :] - cents) ** 2).sum(axis=2).argmin(axis=0)  # [8]
        expect = int(dtab[codes, np.arange(8)].sum())
        assert r["adc_dist"] == expect, (r, expect)


def test_new_ops_plan_shape_flat_at_10x(spark):
    """heavy_hitters / skyline_2d / semantic_decontam_hits / zorder_zone_map
    keep IDENTICAL exchange counts on 10x larger inputs (static planner) —
    the candidate/sketch/broadcast structures, not the data volume, decide
    the shuffle count."""
    import numpy as np

    from pipeline_etl_website_visits_spark.operators import text as T
    from pipeline_etl_website_visits_spark.operators.layout import zorder_zone_map
    from pipeline_etl_website_visits_spark.operators.similarity import semantic_decontam_hits
    from pipeline_etl_website_visits_spark.operators.skyline import skyline_2d

    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        rng = np.random.default_rng(2)
        evals = spark.createDataFrame(
            [(i, rng.normal(size=16).tolist()) for i in range(20)],
            "vec_id long, embedding array<double>",
        )
        counts = {}
        for label, n in (("1x", 300), ("10x", 3000)):
            docs = _synthetic_docs(spark, n)
            nums = spark.range(n).select(
                F.col("id").alias("id"),
                (F.col("id") % 61).cast("int").alias("x"),
                (F.col("id") % 97).cast("double").alias("y"),
            )
            vecs = spark.range(n).select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(15)),
                    lambda j: (F.pmod(F.xxhash64(F.col("id"), j), F.lit(1000)) / 500.0) - 1.0,
                ).alias("embedding"),
            )
            counts[label] = {
                "heavy_hitters": _exchange_count(T.heavy_hitters(docs, "text", denom=64, capacity=128)),
                "skyline": _exchange_count(skyline_2d(nums, "x", "y")),
                "decontam": _exchange_count(semantic_decontam_hits(vecs, evals, threshold=0.9)),
                "zone_map": _exchange_count(zorder_zone_map(nums, F.col("x"), F.col("y").cast("int"))),
            }
        assert counts["10x"] == counts["1x"], counts
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_dynamic_partition_pruning_skips_partitions(spark, tmp_path):
    """Dynamic Partition Pruning: a date-partitioned fact joined to a
    FILTERED dim must scan only the partitions the dim's filter selects —
    the pruning subquery appears in the scan (`dynamicpruning`), and the
    result equals the statically-filtered join. At 100 TB this is the
    difference between scanning one month and scanning the decade when
    the filter arrives through a dimension instead of on the fact."""
    fact = spark.range(0, 20_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 8).cast("int").alias("part_key"),
        (F.col("id") * 3).alias("v"),
    )
    fact_dir = str(tmp_path / "fact_parted")
    fact.write.partitionBy("part_key").parquet(fact_dir)
    dim = spark.createDataFrame(
        [(p, f"grp{p % 2}") for p in range(8)], "part_key int, grp string"
    ).filter(F.col("grp") == "grp0")

    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try:
        joined = (
            spark.read.parquet(fact_dir)
            .join(dim, "part_key")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan
        got = joined.collect()[0]
        want = (
            fact.filter((F.col("part_key") % 2) == 0)
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .collect()[0]
        )
        assert (got["s"], got["n"]) == (want["s"], want["n"])
    finally:
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", prev)


def test_runtime_bloom_filter_join_injection(spark, tmp_path):
    """Runtime row-level filtering: with the runtime bloom-filter rule on,
    a selective dim join injects `bloom_filter_agg` / `might_contain`
    into the fact scan side — rows that cannot join are dropped BEFORE
    the shuffle (at 100 TB, the shuffle volume is the bill). Results
    must equal the un-filtered join exactly (the bloom filter only
    prunes non-joining rows)."""
    fact_dir = str(tmp_path / "fact_flat")
    dim_dir = str(tmp_path / "dim_flat")
    spark.range(0, 200_000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v")
    ).write.parquet(fact_dir)
    spark.range(0, 200_000, 1000).select(
        F.col("id").alias("k"), F.lit("x").alias("lbl")
    ).write.parquet(dim_dir)

    conf = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join so the filter matters
    }
    prev = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        fact = spark.read.parquet(fact_dir)
        dim = spark.read.parquet(dim_dir).filter(F.col("lbl") == "x")
        joined = fact.join(dim, "k").agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        plan = joined._jdf.queryExecution().toString()
        assert "might_contain" in plan or "bloom_filter" in plan.lower(), plan[:4000]
        got = joined.collect()[0]
        assert got["n"] == 200 and got["s"] == sum(i * 7 for i in range(0, 200_000, 1000))
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, tmp_path):
    """AQE skew-join: one hot key dominating a sort-merge join must be
    SPLIT at runtime (OptimizeSkewedJoin marks the join `skew=true` and
    fans the hot partition out to multiple tasks) — the no-manual-salt
    complement to operators/skew.py. At 100 TB a single unsplit hot
    partition is the straggler that holds the whole stage; this pins
    Spark's runtime re-plan doing the split, with results identical to
    the logical join."""
    left_dir = str(tmp_path / "skew_left")
    right_dir = str(tmp_path / "skew_right")
    # hot key 0: 200k rows; tail keys 1..999 with 100 rows each
    spark.range(0, 200_000).select(
        F.lit(0).alias("k"), F.col("id").alias("v")
    ).union(
        spark.range(0, 99_900).select(
            (F.col("id") % 999 + 1).alias("k"), F.col("id").alias("v")
        )
    ).write.parquet(left_dir)
    spark.range(0, 1000).select(F.col("id").alias("k"), F.lit(3).alias("w")).write.parquet(right_dir)

    conf = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ: skew split applies to shuffle joins
    }
    prev = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        left = spark.read.parquet(left_dir)
        right = spark.read.parquet(right_dir)
        joined = left.join(right, "k").agg(
            F.count("*").alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
        )
        got = joined.collect()[0]
        # every left row matches exactly one right row
        assert got["n"] == 200_000 + 99_900
        exp = 3 * (sum(range(200_000)) + sum(range(99_900)))
        assert got["s"] == exp
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:4000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_coalesces_tiny_shuffle_partitions(spark):
    """AQE partition coalescing: a 32-way (test session: 4-way) shuffle
    over a few KB of data must collapse to far fewer read partitions at
    runtime (AQEShuffleRead `coalesced`) — the mechanism that keeps
    shuffle_partitions sized for the LARGE stages from drowning small
    stages in empty-task overhead at 100 TB."""
    conf = {
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64MB",
    }
    prev = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        df = (
            spark.range(0, 10_000)
            .groupBy((F.col("id") % 100).alias("g"))
            .agg(F.count("*").alias("n"))
        )
        # execute THIS df (count() would execute a different plan and
        # leave this one's adaptive plan un-finalized)
        assert len(df.collect()) == 100
        final_plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan, final_plan[:1000]
        assert "AQEShuffleRead coalesced" in final_plan, final_plan[:4000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
