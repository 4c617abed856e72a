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


def _q(name: str, quote: str = '"') -> str:
    """Quote an identifier the way the target dialect's JDBC writer
    creates it (ANSI/Derby double-quote, preserving camelCase — unquoted
    references would normalize to UPPER and miss; MySQL backtick, the
    quoting Spark's MySQLDialect emits)."""
    if not name.replace("_", "").isalnum():
        raise ValueError(f"bad identifier: {name!r}")
    return f"{quote}{name}{quote}"


def _jdbc_execute(
    spark: SparkSession,
    url: str,
    statements: "list[str]",
    driver: str | None = None,
    properties: "dict[str, str] | None" = None,
) -> None:
    """Run DDL/DML over a raw JVM JDBC connection (Spark's read/write API
    has no statement surface; this is how the in-database MERGE runs).

    ``properties`` (user/password/ssl options …) travel as a
    ``java.util.Properties`` via ``getConnection(url, props)`` — the same
    credentials the ``df.write.jdbc`` staging path takes (ADVICE r13: a
    bare ``getConnection(url)`` forced authenticated databases to embed
    credentials in the URL)."""
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    if properties:
        jprops = jvm.java.util.Properties()
        for k, v in properties.items():
            jprops.setProperty(str(k), str(v))
        conn = jvm.java.sql.DriverManager.getConnection(url, jprops)
    else:
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


def _infer_upsert_dialect(url: str) -> str:
    """``mysql`` for MySQL/MariaDB JDBC URLs (no ``MERGE`` statement at
    any version — the reference's own D8 defect is a T-SQL MERGE aimed at
    MySQL), ``ansi`` (``MERGE INTO``) for everything else
    (Derby/DB2/SQL Server/Oracle/Postgres 15+)."""
    u = url.lower()
    return "mysql" if u.startswith(("jdbc:mysql:", "jdbc:mariadb:")) else "ansi"


def build_visitantes_upsert_sql(
    target_table: str = "visitantes",
    staging_table: str = "visitantes_stg",
    process_date: str | None = None,
    dialect: str = "ansi",
) -> "list[str]":
    """The in-database upsert statements ``[upsert, drop_staging]`` for
    one batch, in the requested dialect — pure SQL generation, unit-
    testable without a database.

    Both dialects encode the SAME D20-D22 rule arithmetic (docstring of
    :func:`write_visitantes_jdbc_upsert`); what differs is the carrier:

    - ``ansi``: ``MERGE INTO`` — all SET expressions read pre-update
      target values (standard MERGE semantics).
    - ``mysql``: ``INSERT … SELECT … ON DUPLICATE KEY UPDATE`` (MySQL has
      no ``MERGE``). Two traps are load-bearing here:

      1. **Assignment order.** Unlike MERGE, MySQL evaluates ODKU
         assignments LEFT TO RIGHT and later assignments see earlier
         ones' NEW values. The counter rules read the target's OLD
         ``fechaUltimaVisita`` (is the stored row's last visit in the
         current year/month?), so the counters are assigned FIRST and
         ``fechaUltimaVisita`` LAST. ``VALUES(col)`` always reads the
         would-be-inserted (source) value, order-independent.
      2. **Counter NULLs.** The INSERT leg coalesces counters to 0
         (exactly the MERGE's NOT-MATCHED branch), so ``VALUES(counter)``
         is never NULL. For matched rows this is value-identical to the
         MERGE except in one corner no producer in this repo can emit: a
         NULL source counter on a year/month-restart row becomes 0 here
         where the MERGE falls back to the stored counter. The batch
         aggregate's counters are non-null counts by construction and
         the target DDL declares them NOT NULL.
    """
    import re

    if dialect not in ("ansi", "mysql"):
        raise ValueError(f"dialect must be 'ansi' or 'mysql', got {dialect!r}")
    if process_date is not None:
        if not re.fullmatch(r"\d{4}-\d{2}-\d{2}", process_date):
            raise ValueError(f"process_date must be ISO yyyy-mm-dd, got {process_date!r}")
        cur = f"DATE('{process_date}')"
    else:
        cur = "CURRENT_DATE"
    quote = "`" if dialect == "mysql" else '"'
    for t in (target_table, staging_table):
        _q(t)  # validates
    tgt, stg = target_table, staging_table
    fpv, fuv = _q("fechaPrimeraVisita", quote), _q("fechaUltimaVisita", quote)
    vt, va, vm = (
        _q("visitasTotales", quote),
        _q("visitasAnioActual", quote),
        _q("visitasMesActual", quote),
    )
    em = _q("email", quote)

    if dialect == "ansi":
        upsert = f"""
MERGE INTO {tgt} T
USING {stg} S
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
    else:
        # counters BEFORE fechaUltimaVisita — they read its OLD value
        upsert = f"""
INSERT INTO {tgt} ({em}, {fpv}, {fuv}, {vt}, {va}, {vm})
SELECT {em}, {fpv}, {fuv},
       COALESCE({vt}, 0), COALESCE({va}, 0), COALESCE({vm}, 0)
FROM {stg}
ON DUPLICATE KEY UPDATE
  {va} = CASE WHEN YEAR({fuv}) = YEAR({cur})
              THEN COALESCE({va}, 0) + COALESCE(VALUES({va}), 0)
              ELSE COALESCE(VALUES({va}), {va}, 0) END,
  {vm} = CASE WHEN YEAR({fuv}) = YEAR({cur}) AND MONTH({fuv}) = MONTH({cur})
              THEN COALESCE({vm}, 0) + COALESCE(VALUES({vm}), 0)
              ELSE COALESCE(VALUES({vm}), {vm}, 0) END,
  {vt} = COALESCE({vt}, 0) + COALESCE(VALUES({vt}), 0),
  {fpv} = COALESCE({fpv}, VALUES({fpv})),
  {fuv} = CASE WHEN {fuv} IS NULL THEN VALUES({fuv})
               WHEN VALUES({fuv}) IS NULL THEN {fuv}
               WHEN VALUES({fuv}) > {fuv} THEN VALUES({fuv})
               ELSE {fuv} END
"""
    return [upsert, f"DROP TABLE {stg}"]


def write_visitantes_jdbc_upsert(
    df: DataFrame,
    url: str,
    target_table: str = "visitantes",
    staging_table: str = "visitantes_stg",
    process_date: str | None = None,
    driver: str | None = None,
    batch_size: int = 10_000,
    dialect: str | None = None,
    properties: "dict[str, str] | None" = None,
) -> None:
    """In-DATABASE visitantes upsert: write the batch aggregate to a
    staging table over JDBC, run the upsert inside the database, drop
    the staging table — the reference's actual load mechanism
    (utils/utils_load.py:34-85: ``to_sql(if_exists='replace')`` + T-SQL
    MERGE + ``DROP TABLE``), for users who keep MySQL/SQL-Server as the
    system of record instead of the parquet warehouse.

    ``dialect`` picks the upsert statement (default: inferred from the
    URL by :func:`_infer_upsert_dialect`): ``ansi`` emits ``MERGE INTO``
    (Derby/DB2/SQL Server/Oracle — tested against embedded Derby);
    ``mysql`` emits ``INSERT … ON DUPLICATE KEY UPDATE``, because **MySQL
    has no MERGE statement at any version** — the reference's own D8
    defect (SURVEY §0.1) is precisely a T-SQL MERGE aimed at its MySQL
    sink. Ordering/NULL semantics of the rewrite:
    :func:`build_visitantes_upsert_sql`.

    ``properties`` (user/password/ssl …) are applied to BOTH legs: the
    ``df.write.jdbc`` staging load and the raw statement connection
    (ADVICE r13 — previously only the staging leg could authenticate).

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
    handoff. The ansi leg runs end-to-end against embedded Derby
    (tests/test_sources.py); the mysql leg's generated SQL is pinned and
    its sequential-assignment semantics simulated against the Spark twin
    (no MySQL server ships in this container).
    """
    if dialect is None:
        dialect = _infer_upsert_dialect(url)
    upsert_stmts = build_visitantes_upsert_sql(
        target_table, staging_table, process_date=process_date, dialect=dialect
    )
    quote = "`" if dialect == "mysql" else '"'
    spark = df.sparkSession

    ddl_cols = ", ".join(
        [
            f"{_q('email', quote)} VARCHAR(320) NOT NULL PRIMARY KEY",
            f"{_q('fechaPrimeraVisita', quote)} DATE",
            f"{_q('fechaUltimaVisita', quote)} DATE",
            f"{_q('visitasTotales', quote)} BIGINT NOT NULL",
            f"{_q('visitasAnioActual', quote)} BIGINT NOT NULL",
            f"{_q('visitasMesActual', quote)} BIGINT NOT NULL",
        ]
    )
    try:
        _jdbc_execute(
            spark, url, [f"CREATE TABLE {target_table} ({ddl_cols})"], driver, properties
        )
    except Exception as e:  # noqa: BLE001 — py4j wraps SQLException
        if "X0Y32" not in str(e) and "already exists" not in str(e):
            raise

    # staging load: drop-and-recreate, the to_sql(if_exists='replace')
    # twin. createTableColumnTypes pins email to VARCHAR — some dialects
    # (Derby) map StringType to CLOB, which the upsert's key equality
    # cannot compare against the target's VARCHAR.
    props = {
        "batchsize": str(batch_size),
        "createTableColumnTypes": "email VARCHAR(320)",
        **(properties or {}),
    }
    if driver:
        props["driver"] = driver
    df.select(*_VISITANTES_COLS).write.jdbc(
        url=url, table=staging_table, mode="overwrite", properties=props
    )

    _jdbc_execute(spark, url, upsert_stmts, driver, properties)
