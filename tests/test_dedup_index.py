"""Stored gram index: the dedup counterpart of the stored vector index —
persist the corpus inverted index once, score every batch against it."""

import pyspark.sql.functions as F

from pipeline_etl_website_visits_spark.operators.dedup import (
    append_to_gram_index,
    containment_dedup_vs_stored,
    incremental_containment_dedup,
    save_gram_index,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_stored_index_matches_inline_operator(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    save_gram_index(corpus, "gram_idx_t1", str(tmp_path / "gidx"), "text", "doc_id", n=3)
    stored = containment_dedup_vs_stored(
        batch, spark.table("gram_idx_t1"), "text", "doc_id", n=3, threshold=0.5
    )
    inline = incremental_containment_dedup(corpus, batch, "text", "doc_id", n=3, threshold=0.5)
    assert _rows(stored) == _rows(inline)
    spark.sql("DROP TABLE IF EXISTS gram_idx_t1")


def test_append_equals_rebuild_and_index_side_is_exchange_free(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = docs.filter(F.col("doc_id") % 3 == 0)
    ingested = docs.filter(F.col("doc_id") % 3 == 1)
    batch = docs.filter(F.col("doc_id") % 3 == 2)

    save_gram_index(base, "gram_idx_t2", str(tmp_path / "g2"), "text", "doc_id", n=3)
    append_to_gram_index(ingested, "gram_idx_t2", "text", "doc_id", n=3)
    save_gram_index(
        docs.filter(F.col("doc_id") % 3 != 2), "gram_idx_t3", str(tmp_path / "g3"),
        "text", "doc_id", n=3,
    )
    a = containment_dedup_vs_stored(batch, spark.table("gram_idx_t2"), "text", "doc_id")
    b = containment_dedup_vs_stored(batch, spark.table("gram_idx_t3"), "text", "doc_id")
    assert _rows(a) == _rows(b) and len(_rows(a)) > 0

    # the stored-index side of the gram join must read bucket-aligned and
    # NEVER shuffle: at most ONE gram exchange can appear (the incoming
    # side under a sort-merge plan; zero when the small batch broadcasts,
    # as at this scale)
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan, plan
    n_gram_exchanges = sum(
        1 for line in plan.splitlines() if "Exchange hashpartitioning(gram" in line
    )
    assert n_gram_exchanges <= 1, plan
    for t in ("gram_idx_t2", "gram_idx_t3"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_warehouse_gram_index_roundtrip(spark, tmp_path):
    from pipeline_etl_website_visits_spark.etl.load import Warehouse
    from pipeline_etl_website_visits_spark.operators.dedup import (
        incremental_containment_dedup,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    wh = Warehouse(spark, str(tmp_path / "whg"))
    table = wh.write_gram_index(corpus, name="docs", n=3)
    stored = wh.dedup_against_gram_index(batch, table, n=3, threshold=0.5)
    inline = incremental_containment_dedup(corpus, batch, "text", "doc_id", n=3, threshold=0.5)
    assert _rows(stored) == _rows(inline)
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_gram_index_geometry_validation_and_redo_safety(
    spark, tmp_path, any_commit_backend
):
    """An n mismatch must error loudly (it would otherwise score every
    duplicate ~0 silently); replaying an append with the same applied_key
    is a no-op. Runs under BOTH commit backends (r9): the applied-key
    markers and the save-time ledger reset must live in the backend's
    world, wherever that is."""
    import pytest

    from pipeline_etl_website_visits_spark.etl.load import Warehouse
    from pipeline_etl_website_visits_spark.operators.dedup import append_to_gram_index

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    batch = docs.filter(F.col("doc_id") % 3 == 1)
    wh = Warehouse(spark, str(tmp_path / "whgv"))
    table = wh.write_gram_index(corpus, name="docs", n=3)

    with pytest.raises(ValueError, match="built with n=3"):
        wh.dedup_against_gram_index(batch, table, n=4)
    with pytest.raises(ValueError, match="built with n=3"):
        append_to_gram_index(batch, table, "text", "doc_id", n=4)

    n0 = spark.table(table).count()
    assert append_to_gram_index(batch, table, "text", "doc_id", n=3, applied_key="b1") is True
    n1 = spark.table(table).count()
    assert n1 > n0
    assert append_to_gram_index(batch, table, "text", "doc_id", n=3, applied_key="b1") is False
    assert spark.table(table).count() == n1  # replay appended nothing
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_gram_index_rejects_bad_identifiers(spark, tmp_path):
    import pytest

    from pipeline_etl_website_visits_spark.etl.load import Warehouse

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(5)
    wh = Warehouse(spark, str(tmp_path / "whgb"))
    with pytest.raises(ValueError, match="invalid catalog identifier"):
        wh.write_gram_index(docs, name="my-docs; DROP TABLE x")


def test_gram_index_ledger_is_sidecar_not_tblproperties(spark, tmp_path):
    """ADVICE r5 (low): the round-5 joined-string TBLPROPERTIES ledger
    grew one entry per batch forever and its quoting was one backslash
    away from a corrupted ALTER. Keys now land as write-once marker files
    under <location>/_applied (invisible to the parquet scan — the `_`
    prefix is PathFilter-excluded); TBLPROPERTIES stays bounded, and
    unsafe keys are rejected up front."""
    import os

    import pytest

    from pipeline_etl_website_visits_spark.operators.dedup import (
        _table_location,
        append_to_gram_index,
        save_gram_index,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    batch = docs.filter(F.col("doc_id") % 3 == 1)
    table = "gramidx_ledger_t"
    path = str(tmp_path / "ledger_idx")
    save_gram_index(corpus, table, path, "text", "doc_id", n=3)
    try:
        for bad in ("a\\b", "a'b", "a\x1fb", ""):
            with pytest.raises(ValueError, match="applied_key"):
                append_to_gram_index(batch, table, "text", "doc_id", n=3, applied_key=bad)
        assert append_to_gram_index(batch, table, "text", "doc_id", n=3, applied_key="b1") is True
        assert append_to_gram_index(batch, table, "text", "doc_id", n=3, applied_key="b1") is False
        loc = _table_location(spark, table)
        assert os.path.isfile(os.path.join(loc, "_applied", "b1.key"))
        props = {
            r["key"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
        }
        assert "gram_applied" not in props  # the unbounded ledger is gone
        # the sidecar is invisible to the scan: count still parses every file
        assert spark.table(table).count() > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_compact_gram_index_restores_file_counts_and_preserves_everything(spark, tmp_path):
    """Three appends multiply bucket files; compaction rewrites to one
    file per bucket, keeps dedup results bit-identical, preserves the
    stored gram geometry AND the applied-key ledger (a replayed
    pre-compaction batch still no-ops)."""
    import os

    from pipeline_etl_website_visits_spark.operators.dedup import (
        append_to_gram_index,
        compact_gram_index,
        containment_dedup_vs_stored,
        gram_index_n,
        save_gram_index,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 4 == 0)
    probe = docs.filter(F.col("doc_id") % 4 == 1)
    table = "gramidx_compact_t"
    path = str(tmp_path / "cidx")
    try:
        save_gram_index(corpus, table, path, "text", "doc_id", n=3, n_buckets=8)
        for i, m in enumerate((2, 3)):
            batch = docs.filter(F.col("doc_id") % 4 == m)
            assert append_to_gram_index(batch, table, "text", "doc_id", n=3, applied_key=f"b{i}")

        def data_files(loc):
            return [f for f in os.listdir(loc) if not f.startswith(("_", "."))]

        assert len(data_files(path)) > 8  # appends piled files up
        before = sorted(
            map(tuple, containment_dedup_vs_stored(probe, spark.table(table), "text", "doc_id", n=3).collect())
        )
        n_rows = spark.table(table).count()

        new_loc = compact_gram_index(spark, table, n_buckets=8)
        assert len(data_files(new_loc)) == 8  # one file per bucket
        assert spark.table(table).count() == n_rows
        assert gram_index_n(spark, table) == 3
        after = sorted(
            map(tuple, containment_dedup_vs_stored(probe, spark.table(table), "text", "doc_id", n=3).collect())
        )
        assert before == after
        # ledger survived: replaying a pre-compaction batch is still a no-op
        batch = docs.filter(F.col("doc_id") % 4 == 2)
        assert append_to_gram_index(batch, table, "text", "doc_id", n=3, applied_key="b0") is False
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_compact_migrates_legacy_property_keys(spark, tmp_path):
    """A pre-sidecar index recorded applied keys in TBLPROPERTIES; the
    new registration after compaction only carries gram_n, so those keys
    must migrate into the sidecar ledger or their batches would
    double-append on replay."""
    from pipeline_etl_website_visits_spark.operators.dedup import (
        append_to_gram_index,
        compact_gram_index,
        save_gram_index,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 4 == 0)
    batch = docs.filter(F.col("doc_id") % 4 == 1)
    table = "gramidx_legacy_t"
    try:
        save_gram_index(corpus, table, str(tmp_path / "lidx"), "text", "doc_id", n=3, n_buckets=8)
        # simulate a round-5-era ledger: key recorded in TBLPROPERTIES only
        assert append_to_gram_index(batch, table, "text", "doc_id", n=3, applied_key="legacy1")
        spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ('gram_applied'='legacy0')")
        compact_gram_index(spark, table, n_buckets=8)
        # both the sidecar key and the migrated legacy property key no-op
        assert append_to_gram_index(batch, table, "text", "doc_id", n=3, applied_key="legacy1") is False
        assert append_to_gram_index(batch, table, "text", "doc_id", n=3, applied_key="legacy0") is False
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_compact_folds_racing_gram_append_and_carries_its_marker(
    spark, tmp_path, any_commit_backend
):
    """The round-6 ADVICE race: an append committing between compaction's
    snapshot and its swap must have BOTH its rows and its ledger marker in
    the new location — with remove_old=True (the permanent-loss path) the
    delta fold under the writer lease is what saves the batch. Runs under
    BOTH commit backends (VERDICT r8 item 2): the marker carry and the
    lease hand-off must not lean on POSIX rename/O_EXCL."""
    import os

    from pipeline_etl_website_visits_spark.operators.dedup import (
        append_to_gram_index,
        compact_gram_index,
        save_gram_index,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 4 == 0)
    racer = docs.filter(F.col("doc_id") % 4 == 3)
    table = "gramidx_race_t"
    path = str(tmp_path / "ridx")
    try:
        save_gram_index(corpus, table, path, "text", "doc_id", n=3, n_buckets=8)
        n_before = spark.table(table).count()
        n_racer = None

        def racing_append():
            nonlocal n_racer
            assert append_to_gram_index(
                racer, table, "text", "doc_id", n=3, applied_key="racer"
            )
            n_racer = spark.table(table).count() - n_before

        new_loc = compact_gram_index(
            spark, table, remove_old=True, _before_swap=racing_append
        )
        assert not os.path.exists(path)  # old location destroyed
        assert n_racer and n_racer > 0
        # the racing batch's rows survived into the new location...
        assert spark.table(table).count() == n_before + n_racer
        assert os.path.dirname(new_loc + "/") != path
        # ...and its marker did too: the replay no-ops instead of doubling
        assert (
            append_to_gram_index(racer, table, "text", "doc_id", n=3, applied_key="racer")
            is False
        )
        assert spark.table(table).count() == n_before + n_racer
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_compact_reads_stored_bucket_count(spark, tmp_path):
    """gram_buckets persists in TBLPROPERTIES: compacting WITHOUT passing
    n_buckets must preserve the build's bucket spec (a silent re-bucket to
    a default would mismatch other sessions' registrations against the
    file layout), and the property must survive the re-registration."""
    import os

    from pipeline_etl_website_visits_spark.operators.dedup import (
        _gram_index_props,
        compact_gram_index,
        save_gram_index,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 4 == 0)
    table = "gramidx_buckets_t"
    try:
        save_gram_index(corpus, table, str(tmp_path / "bidx"), "text", "doc_id", n=3, n_buckets=8)
        assert _gram_index_props(spark, table).get("gram_buckets") == "8"
        new_loc = compact_gram_index(spark, table)  # no n_buckets passed
        assert _gram_index_props(spark, table).get("gram_buckets") == "8"
        files = [f for f in os.listdir(new_loc) if not f.startswith(("_", "."))]
        assert len(files) == 8  # one file per ORIGINAL bucket, not per-32
        # the catalog bucket spec matches too
        ddl = spark.sql(f"SHOW CREATE TABLE {table}").collect()[0][0]
        assert "INTO 8 BUCKETS" in ddl
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_concurrent_gram_appends_race_destructive_compaction(spark, tmp_path):
    """Threaded appends fired WHILE a destructive compaction runs: whoever
    loses the lease must either be folded in as delta (committed before the
    swap) or retry against the swapped location (blocked past it) — never
    crash on the removed directory, never lose rows, never double-apply."""
    import threading

    from pipeline_etl_website_visits_spark.operators.dedup import (
        append_to_gram_index,
        compact_gram_index,
        save_gram_index,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 8 == 0)
    table = "gramidx_stress_t"
    path = str(tmp_path / "sidx")
    try:
        save_gram_index(corpus, table, path, "text", "doc_id", n=3, n_buckets=8)
        batches = [docs.filter(F.col("doc_id") % 8 == m) for m in (1, 2, 3)]
        batch_grams = []
        for b in batches:
            from pipeline_etl_website_visits_spark.operators.dedup import shingles

            batch_grams.append(shingles(b, "text", "doc_id", 3).count())
        n0 = spark.table(table).count()

        errs = []

        def appender(i, b):
            try:
                assert append_to_gram_index(
                    b, table, "text", "doc_id", n=3, applied_key=f"stress-{i}"
                )
            except Exception as e:  # noqa: BLE001 - the failure mode under test
                errs.append(repr(e))

        threads = [
            threading.Thread(target=appender, args=(i, b))
            for i, b in enumerate(batches)
        ]
        for t in threads:
            t.start()
        compact_gram_index(spark, table, remove_old=True)
        for t in threads:
            t.join(timeout=180)
        assert not errs, errs
        spark.catalog.refreshTable(table)
        assert spark.table(table).count() == n0 + sum(batch_grams)
        # every marker survived wherever its rows landed: replays no-op
        for i, b in enumerate(batches):
            assert (
                append_to_gram_index(b, table, "text", "doc_id", n=3, applied_key=f"stress-{i}")
                is False
            )
        assert spark.table(table).count() == n0 + sum(batch_grams)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_gc_gram_generations_removes_only_dead_family_dirs(spark, tmp_path):
    """Two compactions leave two dead generations; GC removes exactly the
    dead family members — never the live location, never an unrelated
    sibling directory — and the index still answers afterwards."""
    import os

    from pipeline_etl_website_visits_spark.operators.dedup import (
        compact_gram_index,
        containment_dedup_vs_stored,
        gc_gram_generations,
        save_gram_index,
        _table_location,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 4 == 0)
    probe = docs.filter(F.col("doc_id") % 4 == 1)
    table = "gramidx_gc_t"
    path = str(tmp_path / "gidx")
    unrelated = tmp_path / "gidx_other"  # shares the prefix's parent, not the family
    unrelated.mkdir()
    try:
        save_gram_index(corpus, table, path, "text", "doc_id", n=3, n_buckets=8)
        before = sorted(
            map(tuple, containment_dedup_vs_stored(probe, spark.table(table), "text", "doc_id", n=3).collect())
        )
        compact_gram_index(spark, table)
        compact_gram_index(spark, table)
        live = _table_location(spark, table)
        removed = gc_gram_generations(spark, table)
        assert len(removed) == 2 and path in removed  # original + first generation
        assert os.path.isdir(live) and os.path.isdir(unrelated)
        after = sorted(
            map(tuple, containment_dedup_vs_stored(probe, spark.table(table), "text", "doc_id", n=3).collect())
        )
        assert after == before
        assert gc_gram_generations(spark, table) == []  # idempotent
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_stale_registration_append_redirects_to_live_generation(
    spark, tmp_path, any_commit_backend
):
    """The ADVICE-r7 multi-driver race, simulated with two catalog
    entries over one index family (each entry is an independent
    per-session-style pointer): driver B registers, driver A compacts
    destructively (B's registration now names a DEAD generation), then
    B appends. Without the family pointer B would commit rows + marker
    into the dead dir and GC would silently lose the batch; with it, B
    re-registers at the live generation under the writer lease and the
    batch lands there."""
    import os

    from pipeline_etl_website_visits_spark.operators import ledger
    from pipeline_etl_website_visits_spark.operators.dedup import (
        compact_gram_index,
        containment_dedup_vs_stored,
        gc_gram_generations,
        register_gram_index,
        save_gram_index,
        _table_location,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    batch = docs.filter(F.col("doc_id") % 3 == 1)
    probe = docs.filter(F.col("doc_id") % 3 == 2)
    path = str(tmp_path / "gidx")
    try:
        save_gram_index(corpus, "gram_stale_a", path, "text", "doc_id", n=3, n_buckets=8)
        register_gram_index(spark, "gram_stale_b", path, n_buckets=8, n=3)
        live = compact_gram_index(spark, "gram_stale_a", remove_old=True)
        assert _table_location(spark, "gram_stale_b") == path  # B is stale
        assert append_to_gram_index(
            batch, "gram_stale_b", "text", "doc_id", n=3, applied_key="k1"
        ) is True
        # B re-registered itself at the live generation and committed there
        assert _table_location(spark, "gram_stale_b") == live
        assert "k1" in ledger.applied_keys(os.path.join(live, "_applied"))
        # the batch's grams answer queries (and the replay still no-ops)
        got = containment_dedup_vs_stored(
            probe, spark.table("gram_stale_b"), "text", "doc_id", n=3
        )
        save_gram_index(
            docs.filter(F.col("doc_id") % 3 != 2), "gram_stale_ref",
            str(tmp_path / "gref"), "text", "doc_id", n=3, n_buckets=8,
        )
        want = containment_dedup_vs_stored(
            probe, spark.table("gram_stale_ref"), "text", "doc_id", n=3
        )
        assert _rows(got) == _rows(want) and len(_rows(got)) > 0
        assert append_to_gram_index(
            batch, "gram_stale_b", "text", "doc_id", n=3, applied_key="k1"
        ) is False
        # GC resolves live from the family pointer — the dead generation
        # dir a blocked waiter may have recreated is swept, live survives
        gc_gram_generations(spark, "gram_stale_b")
        assert os.path.isdir(live)
        assert _rows(containment_dedup_vs_stored(
            probe, spark.table("gram_stale_b"), "text", "doc_id", n=3
        )) == _rows(want)
    finally:
        for t in ("gram_stale_a", "gram_stale_b", "gram_stale_ref"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_two_process_append_and_compaction_share_one_index(spark, tmp_path):
    """VERDICT r7 item 2: the lease/pointer protocol across TWO DRIVER
    PROCESSES (separate JVMs, separate catalogs, same index family on
    disk) — in-process thread goldens prove the protocol's logic, this
    proves nothing secretly rides on in-session state.

    Driver B (a real subprocess) registers the index and appends a batch
    while driver A (this session) is mid-compaction (snapshot written,
    swap not yet taken — the _before_swap seam parks A until B commits).
    A's final fold must then carry B's rows + marker into the new
    generation, destructively sweep the old one, and publish the family
    pointer. A SECOND run of B — whose fresh catalog registration is
    stale at birth (it names the swept base path) — must follow the
    pointer to the live generation and no-op on the replayed key."""
    import os
    import subprocess
    import sys
    import threading
    import time

    from pipeline_etl_website_visits_spark.operators import ledger
    from pipeline_etl_website_visits_spark.operators.dedup import (
        compact_gram_index,
        containment_dedup_vs_stored,
        save_gram_index,
        _table_location,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    probe = docs.filter(F.col("doc_id") % 3 == 2)
    path = str(tmp_path / "gidx")
    sentinel = str(tmp_path / "b_done")
    script = tmp_path / "driver_b.py"
    script.write_text(
        f"""
import sys
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
import pyspark.sql.functions as F
from pipeline_etl_website_visits_spark.session import get_spark
from pipeline_etl_website_visits_spark.operators.dedup import (
    append_to_gram_index, register_gram_index,
)

spark = get_spark(
    "driver-b", master="local[2]", shuffle_partitions=2,
    extra_conf={{"spark.ui.enabled": "false",
                 "spark.sql.warehouse.dir": {repr(str(tmp_path / "wh_b"))}}},
)
spark.sparkContext.setLogLevel("ERROR")
register_gram_index(spark, "gram_b", {repr(path)}, n_buckets=8, n=3)
docs = spark.read.parquet({repr(f"{SF_DIR}/documents.parquet")})
batch = docs.filter(F.col("doc_id") % 3 == 1)
ok = append_to_gram_index(batch, "gram_b", "text", "doc_id", n=3, applied_key="xp1")
print("APPENDED", ok, flush=True)
open({repr(sentinel)}, "w").write("done")
spark.stop()
"""
    )

    def run_b():
        return subprocess.run(
            [sys.executable, str(script)], capture_output=True, text=True, timeout=300
        )

    try:
        save_gram_index(corpus, "gram_xproc", path, "text", "doc_id", n=3, n_buckets=8)
        results = {}

        def compact():
            b = run_b()
            results["b1"] = b
            deadline = time.monotonic() + 300
            while not os.path.exists(sentinel) and time.monotonic() < deadline:
                time.sleep(0.2)

        live = compact_gram_index(
            spark, "gram_xproc", remove_old=True, _before_swap=compact
        )
        assert "APPENDED True" in results["b1"].stdout, results["b1"].stderr[-2000:]
        # one consistent generation: pointer == catalog == the only dir
        assert _table_location(spark, "gram_xproc") == live
        assert not os.path.exists(path), "dead generation survived remove_old"
        assert "xp1" in ledger.applied_keys(os.path.join(live, "_applied"))
        # B's rows answer through A's session — index == corpus + B's batch
        got = containment_dedup_vs_stored(
            probe, spark.table("gram_xproc"), "text", "doc_id", n=3
        )
        save_gram_index(
            docs.filter(F.col("doc_id") % 3 != 2), "gram_xproc_ref",
            str(tmp_path / "gref"), "text", "doc_id", n=3, n_buckets=8,
        )
        want = containment_dedup_vs_stored(
            probe, spark.table("gram_xproc_ref"), "text", "doc_id", n=3
        )
        assert _rows(got) == _rows(want) and len(_rows(got)) > 0
        # driver B round 2: stale-at-birth registration follows the family
        # pointer to the live generation and the replayed key no-ops
        os.remove(sentinel)
        b2 = run_b()
        assert "APPENDED False" in b2.stdout, b2.stderr[-2000:]
        assert _rows(containment_dedup_vs_stored(
            probe, spark.table("gram_xproc"), "text", "doc_id", n=3
        )) == _rows(want)
    finally:
        for t in ("gram_xproc", "gram_xproc_ref"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_gram_compact_crash_before_family_pointer_swap(spark, tmp_path):
    """Crash-inject the gram compaction's FAMILY-pointer publish: the new
    generation is written and this session's catalog even swapped, but
    the session-independent pointer still names the OLD generation — the
    durable truth. An append must redirect back to the old generation
    (pointer beats catalog), GC must sweep the orphaned rewrite, and a
    retry compaction must land everything including the post-crash
    append."""
    import os

    from pipeline_etl_website_visits_spark.operators import ledger
    from pipeline_etl_website_visits_spark.operators.dedup import (
        _table_location,
        compact_gram_index,
        gc_gram_generations,
        save_gram_index,
    )

    class CrashOnFamilySwap(ledger.LocalCommitBackend):
        armed = True

        def publish(self, path, payload):
            if self.armed and os.path.basename(path).endswith(".pointer"):
                self.armed = False
                raise OSError("injected crash before the family pointer swap")
            super().publish(path, payload)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 4 == 0)
    batch = docs.filter(F.col("doc_id") % 4 == 1)
    table = "gramidx_crash_ptr_t"
    path = str(tmp_path / "cidx")
    prev = None
    try:
        save_gram_index(corpus, table, path, "text", "doc_id", n=3, n_buckets=8)
        n0 = spark.table(table).count()
        prev = ledger.set_commit_backend(CrashOnFamilySwap())
        import pytest

        with pytest.raises(OSError, match="injected"):
            compact_gram_index(spark, table)
        # the pointer still names generation zero — the durable truth
        from pipeline_etl_website_visits_spark.operators.dedup import (
            _family_live_location,
        )

        assert os.path.realpath(_family_live_location(path) or path) == os.path.realpath(path)
        # an append follows the pointer back to the OLD generation, even
        # though this session's catalog was already swapped by the crash
        assert append_to_gram_index(
            batch, table, "text", "doc_id", n=3, applied_key="pc1"
        )
        assert os.path.realpath(_table_location(spark, table)) == os.path.realpath(path)
        n1 = spark.table(table).count()
        assert n1 > n0
        assert "pc1" in ledger.applied_keys(os.path.join(path, "_applied"))
        # GC sweeps the orphaned rewrite (unreferenced by the pointer)
        removed = gc_gram_generations(spark, table)
        assert removed and all(".compact." in r for r in removed), removed
        # retry compaction completes: pointer + catalog + rows all new
        new_loc = compact_gram_index(spark, table, remove_old=True)
        assert os.path.realpath(_table_location(spark, table)) == os.path.realpath(new_loc)
        assert not os.path.exists(path)
        spark.catalog.refreshTable(table)
        assert spark.table(table).count() == n1
        assert append_to_gram_index(
            batch, table, "text", "doc_id", n=3, applied_key="pc1"
        ) is False  # marker carried through the retry
    finally:
        if prev is not None:
            ledger.set_commit_backend(prev)
        spark.sql(f"DROP TABLE IF EXISTS {table}")
