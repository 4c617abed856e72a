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
