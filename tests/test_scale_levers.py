"""Evidence tests for the 100 TB scale levers flagged in the round-1 verdict:
the doc-frequency cap under stop-shingle skew, the reliable-checkpoint path
of connected components, exact integer ratio arithmetic past 2^53, and the
as-of join tie rule.
"""

import datetime as dt

import pyspark.sql.functions as F

from pipeline_etl_website_visits_spark.functions import ratio_round
from pipeline_etl_website_visits_spark.operators import dedup as D
from pipeline_etl_website_visits_spark.operators.rangejoin import asof_join


def test_doc_freq_cap_collapses_stop_shingle_blowup(spark):
    """One stop-shingle shared by 50% of docs makes the uncapped inverted
    index quadratic (~C(100,2) pairs); max_doc_freq collapses the candidate
    set while keeping full recall on planted near-duplicates."""
    rows = []
    for i in range(200):
        text = f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}"
        if i % 2 == 0:
            text += " common stop phrase here now"
        rows.append((i, text))
    planted = set()
    for j in range(3):
        body = " ".join(f"w{j}x{k}" for k in range(12))
        rows.append((1000 + 2 * j, body))
        rows.append((1001 + 2 * j, body + f" tail{j}"))
        planted.add((1000 + 2 * j, 1001 + 2 * j))
    df = spark.createDataFrame(rows, "doc_id int, text string").repartition(4)

    uncapped = D.shingle_jaccard_pairs(df, "text", "doc_id", threshold=0.01).collect()
    capped = D.shingle_jaccard_pairs(
        df, "text", "doc_id", threshold=0.01, max_doc_freq=10
    ).collect()

    # every even-doc pair shares the stop grams: quadratic blowup
    assert len(uncapped) > 4000
    capped_pairs = {(r["doc_a"], r["doc_b"]) for r in capped}
    assert planted <= capped_pairs  # recall on true near-dups holds
    assert len(capped_pairs) < 50  # blowup gone (planted pairs only)


def test_dedup_clusters_reliable_checkpoint_and_fixed_iterations(spark, tmp_path):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "doc_a int, doc_b int")
    expected = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def run(**kw):
        return {r["doc_id"]: r["cluster_id"] for r in D.dedup_clusters(pairs, **kw).collect()}

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    assert run() == expected  # localCheckpoint fallback path
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        assert sc.getCheckpointDir() is not None
        assert run() == expected  # reliable checkpoint() path
        # escape hatch: fixed iteration count, no convergence probe jobs
        assert run(max_iterations=5, check_convergence=False) == expected
    finally:
        sc._jsc.sc().setCheckpointDir(None)
    assert sc.getCheckpointDir() is None


def test_ratio_round_exact_past_double_precision(spark):
    """num*2*10^d beyond 2^53: double division silently rounds; the
    IntegralDivide quotient must match Python's exact // ."""
    num, den = (1 << 50) + 3, 7
    assert num * 2000 > 2**53  # double mantissa exceeded, int64 still fine
    expected = ((num * 2000 + den) // (2 * den)) / 1000.0
    # the float-division formula demonstrably diverges here
    assert int((num * 2000 + den) / (2 * den)) != (num * 2000 + den) // (2 * den)
    got = spark.range(1).select(ratio_round(F.lit(num), F.lit(den), 3).alias("r")).first()["r"]
    assert got == expected


def test_asof_join_equal_timestamp_tie_rule(spark):
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, t0, 100)], "k int, ts timestamp, id int")
    right = spark.createDataFrame(
        [(1, t0, 7), (1, t0, 9), (1, t0 - dt.timedelta(seconds=5), 8)],
        "k int, ts timestamp, id int",
    )
    out = asof_join(left, right, "k", "ts", "id").collect()
    assert len(out) == 1
    # at-or-before: equal-ts right rows match; greatest id wins the ts tie
    assert out[0]["right_id"] == 9

    # identical (ts, id) on both sides: sides are ordered by tag, never by
    # cross-domain id comparison — result stays deterministic
    left2 = spark.createDataFrame([(1, t0, 9)], "k int, ts timestamp, id int")
    out2 = asof_join(left2, right, "k", "ts", "id").collect()
    assert out2[0]["right_id"] == 9

    # left row earlier than every right row -> NULL match
    left3 = spark.createDataFrame(
        [(1, t0 - dt.timedelta(hours=1), 5)], "k int, ts timestamp, id int"
    )
    assert asof_join(left3, right, "k", "ts", "id").first()["right_id"] is None


def test_partition_pruning_static_and_dynamic(spark, tmp_path):
    """The two partition-pruning levers the warehouse layouts rely on:
    (a) a literal filter on the partition column reaches PartitionFilters
    (only matching dirs are listed/read); (b) a join against a filtered dim
    plants a dynamic-pruning subquery on the fact's partition column."""
    import pyspark.sql.functions as F

    from pipeline_etl_website_visits_spark.plans import formatted_plan

    fact = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("day"), (F.col("id") % 5).alias("k")
    )
    path = str(tmp_path / "fact_part")
    fact.write.partitionBy("day").parquet(path)
    part = spark.read.parquet(path)

    # (a) static pruning
    plan = formatted_plan(part.filter(F.col("day") == 3).select("id"))
    assert "PartitionFilters" in plan
    seg = plan[plan.index("PartitionFilters"):].splitlines()[0]
    assert "day" in seg and "3" in seg, seg

    # (b) dynamic partition pruning: dim filter not known until runtime
    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try:
        dim = spark.range(7).select(F.col("id").alias("day"), (F.col("id") * 10).alias("w"))
        dim_path = str(tmp_path / "dim")
        dim.write.parquet(dim_path)
        dimr = spark.read.parquet(dim_path).filter(F.col("w") == 30)
        joined = part.join(dimr, "day").select(part.id)
        plan_j = formatted_plan(joined)
        assert "dynamicpruning" in plan_j.lower(), plan_j
    finally:
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", prev)


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """session.py enables runtime bloom-filter join pruning: a selective
    dim-side filter becomes a bloom membership test on the fact side
    BEFORE the join shuffle (the engine-native form of x66's prefilter
    shape). The size gates that keep it inert on toy data are lowered
    here to prove the rule fires; at real scale the defaults fire on
    their own (creation side <100MB, fact scan >10GB)."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # broadcast join would not need the filter
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        sf = "/root/testdata/sf0.001"
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        od = spark.read.parquet(f"{sf}/orders.parquet").filter(F.col("o_totalprice") > 450000)
        j = li.join(od, li.l_orderkey == od.o_orderkey).groupBy("o_orderstatus").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), plan[:2000]
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
