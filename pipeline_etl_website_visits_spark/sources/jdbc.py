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


_VISITANTES_COLS = (
    "email",
    "fechaPrimeraVisita",
    "fechaUltimaVisita",
    "visitasTotales",
    "visitasAnioActual",
    "visitasMesActual",
)


def _q(name: str) -> str:
    """Quote an identifier the way Spark's JDBC writer creates it (the
    dialect double-quotes column names, preserving camelCase — unquoted
    references would normalize to UPPER and miss)."""
    if not name.replace("_", "").isalnum():
        raise ValueError(f"bad identifier: {name!r}")
    return f'"{name}"'


def _jdbc_execute(spark: SparkSession, url: str, statements: "list[str]", driver: str | None = None) -> None:
    """Run DDL/DML over a raw JVM JDBC connection (Spark's read/write API
    has no statement surface; this is how the in-database MERGE runs)."""
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            for sql in statements:
                st.execute(sql)
        finally:
            st.close()
    finally:
        conn.close()


def write_visitantes_jdbc_upsert(
    df: DataFrame,
    url: str,
    target_table: str = "visitantes",
    staging_table: str = "visitantes_stg",
    process_date: str | None = None,
    driver: str | None = None,
    batch_size: int = 10_000,
) -> None:
    """In-DATABASE visitantes upsert: write the batch aggregate to a
    staging table over JDBC, run ``MERGE INTO`` inside the database, drop
    the staging table — the reference's actual load mechanism
    (utils/utils_load.py:34-85: ``to_sql(if_exists='replace')`` + T-SQL
    MERGE + ``DROP TABLE``), for users who keep MySQL/SQL-server as the
    system of record instead of the parquet warehouse.

    The merge rules mirror :func:`operators.merge.visitantes_merge`
    digit-for-digit (D20-D22 SURVEY rulings, not the reference SQL's
    defects — its fechaPrimeraVisita CASE is a no-op and its
    visitasMesActual compares the month against the SOURCE row):

    - ``fechaPrimeraVisita``: never changes once set (COALESCE(T, S));
    - ``fechaUltimaVisita``: null-safe greatest of both;
    - ``visitasTotales``: T + S (NULL as 0);
    - ``visitasAnioActual``: T + S when the target's OLD
      fechaUltimaVisita falls in ``process_date``'s year, else restart
      from S;
    - ``visitasMesActual``: same with year AND month.

    SET expressions read the pre-update target values (standard MERGE
    semantics), exactly like the Spark twin's full-outer join. Target
    rows the batch does not touch keep their stored values verbatim
    (SQL MERGE has no NOT-MATCHED-BY-SOURCE clause) — value-identical to
    the Spark twin, whose pass-through branches coalesce only NULL
    counters; the ensure-create DDL declares the counters NOT NULL so
    that corner cannot exist in a table this function created.

    ``process_date`` (ISO yyyy-mm-dd) pins "current" for deterministic
    replays — the Spark twin's same knob; defaults to the DB's
    CURRENT_DATE. Scale: the batch is the SMALL side (one row per email
    seen today); Spark computes it distributed, the database applies it
    keyed on its own primary-key index — the standard warehouse→serving
    handoff. Tested against embedded Derby (tests/test_sources.py), the
    same MERGE dialect as MySQL 8 / SQL Server up to the date functions.
    """
    import re

    for t in (target_table, staging_table):
        _q(t)  # validates
    if process_date is not None:
        if not re.fullmatch(r"\d{4}-\d{2}-\d{2}", process_date):
            raise ValueError(f"process_date must be ISO yyyy-mm-dd, got {process_date!r}")
        cur = f"DATE('{process_date}')"
    else:
        cur = "CURRENT_DATE"
    spark = df.sparkSession

    ddl_cols = ", ".join(
        [
            f"{_q('email')} VARCHAR(320) NOT NULL PRIMARY KEY",
            f"{_q('fechaPrimeraVisita')} DATE",
            f"{_q('fechaUltimaVisita')} DATE",
            f"{_q('visitasTotales')} BIGINT NOT NULL",
            f"{_q('visitasAnioActual')} BIGINT NOT NULL",
            f"{_q('visitasMesActual')} BIGINT NOT NULL",
        ]
    )
    try:
        _jdbc_execute(spark, url, [f"CREATE TABLE {target_table} ({ddl_cols})"], driver)
    except Exception as e:  # noqa: BLE001 — py4j wraps SQLException
        if "X0Y32" not in str(e) and "already exists" not in str(e):
            raise

    # staging load: drop-and-recreate, the to_sql(if_exists='replace')
    # twin. createTableColumnTypes pins email to VARCHAR — some dialects
    # (Derby) map StringType to CLOB, which the MERGE's key equality
    # cannot compare against the target's VARCHAR.
    props = {
        "batchsize": str(batch_size),
        "createTableColumnTypes": "email VARCHAR(320)",
    }
    if driver:
        props["driver"] = driver
    df.select(*_VISITANTES_COLS).write.jdbc(
        url=url, table=staging_table, mode="overwrite", properties=props
    )

    fpv, fuv = _q("fechaPrimeraVisita"), _q("fechaUltimaVisita")
    vt, va, vm = _q("visitasTotales"), _q("visitasAnioActual"), _q("visitasMesActual")
    em = _q("email")
    merge_sql = f"""
MERGE INTO {target_table} T
USING {staging_table} S
ON T.{em} = S.{em}
WHEN MATCHED THEN UPDATE SET
  {fpv} = COALESCE(T.{fpv}, S.{fpv}),
  {fuv} = CASE WHEN T.{fuv} IS NULL THEN S.{fuv}
               WHEN S.{fuv} IS NULL THEN T.{fuv}
               WHEN S.{fuv} > T.{fuv} THEN S.{fuv}
               ELSE T.{fuv} END,
  {vt} = COALESCE(T.{vt}, 0) + COALESCE(S.{vt}, 0),
  {va} = CASE WHEN YEAR(T.{fuv}) = YEAR({cur})
              THEN COALESCE(T.{va}, 0) + COALESCE(S.{va}, 0)
              ELSE COALESCE(S.{va}, T.{va}, 0) END,
  {vm} = CASE WHEN YEAR(T.{fuv}) = YEAR({cur}) AND MONTH(T.{fuv}) = MONTH({cur})
              THEN COALESCE(T.{vm}, 0) + COALESCE(S.{vm}, 0)
              ELSE COALESCE(S.{vm}, T.{vm}, 0) END
WHEN NOT MATCHED THEN INSERT ({em}, {fpv}, {fuv}, {vt}, {va}, {vm})
VALUES (S.{em}, S.{fpv}, S.{fuv},
        COALESCE(S.{vt}, 0), COALESCE(S.{va}, 0), COALESCE(S.{vm}, 0))
"""
    _jdbc_execute(spark, url, [merge_sql, f"DROP TABLE {staging_table}"], driver)
