"""Physical-plan assertions: the scale properties the engine promises.

These lock in that Catalyst produces the plans the 100 TB design depends
on — filter pushdown into the scan, column pruning, broadcast dim joins,
whole-stage codegen on hot paths. A regression here is a scale bug even
when results stay correct.
"""

import pyspark.sql.functions as F

from pipeline_etl_website_visits_spark.plans import (
    codegen_stage_count,
    has_pushed_filter,
    read_schema_columns,
    uses_broadcast_join,
)
from pipeline_etl_website_visits_spark.queries.registry import REGISTRY
import pipeline_etl_website_visits_spark.queries  # noqa: F401
from pipeline_etl_website_visits_spark.tables import load_table
from tests.conftest import SF_DIR


def test_filter_pushdown_reaches_scan(spark):
    orders = load_table(spark, SF_DIR, "orders")
    df = orders.filter(F.col("o_custkey") == 42).select("o_orderkey")
    assert has_pushed_filter(df, "o_custkey")


def test_column_pruning(spark):
    """A 2-column projection must not read all 6 order columns."""
    df = REGISTRY["q01_scan_project_rename"].spark(spark, SF_DIR)
    cols = read_schema_columns(df)
    assert set(cols) == {"o_orderkey", "o_orderstatus"}


def test_dim_join_broadcasts(spark):
    df = REGISTRY["q12_inner_join"].spark(spark, SF_DIR)
    assert uses_broadcast_join(df)


def test_semi_join_broadcasts(spark):
    df = REGISTRY["q13_semi_join"].spark(spark, SF_DIR)
    assert uses_broadcast_join(df)


def test_flagship_is_codegen_agg_with_map_side_combine(spark):
    df = REGISTRY["q00_flagship_visitantes"].spark(spark, SF_DIR)
    df.collect()  # AQE finalizes THIS plan (codegen ids) only on execution
    assert codegen_stage_count(df) >= 1
    from pipeline_etl_website_visits_spark.plans import simple_plan

    # partial aggregation before the exchange = map-side combine: the
    # shuffle carries one row per (partition, custkey), not per order.
    assert "partial_count" in simple_plan(df)


def test_error_explode_stays_codegen(spark):
    """E1 (the reference's Python iterrows loop) must compile to codegen."""
    df = REGISTRY["q05_error_explode"].spark(spark, SF_DIR)
    assert codegen_stage_count(df) >= 1
    assert set(read_schema_columns(df)) == {
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_discount",
        "l_tax",
    }
