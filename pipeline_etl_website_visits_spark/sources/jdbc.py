"""JDBC source/sink (the reference's MySQL surface, reference
tasks/load.py:26-30 / utils/utils_load.py:19).

The engine's own warehouse is parquet; JDBC exists for parity with users
who keep MySQL as the serving store. Reads are partitioned on a numeric
column so the scan parallelizes (``numPartitions`` × bound split — the
JDBC equivalent of file splits); writes batch inserts.

No MySQL exists in this container, but Spark bundles the Derby embedded
driver, so tests exercise this surface against a REAL database
(tests/test_sources.py: batched append + partitioned read, stride
predicates covering every row exactly once). The call surface is the
standard ``spark.read/write.jdbc`` one — against MySQL only the URL and
driver class change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 8,
    **properties: str,
) -> DataFrame:
    return spark.read.jdbc(
        url=url,
        table=table,
        column=partition_column,
        lowerBound=lower_bound,
        upperBound=upper_bound,
        numPartitions=num_partitions,
        properties=dict(properties),
    )


def write_jdbc_append(df: DataFrame, url: str, table: str, batch_size: int = 10_000, **properties: str) -> None:
    props = {"batchsize": str(batch_size), **properties}
    df.write.jdbc(url=url, table=table, mode="append", properties=props)
