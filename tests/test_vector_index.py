"""Stored vector index (operators/vector_index.py): encode once / search
many, with partition pruning and no re-encode — VERDICT r4 item 6."""

import os

import pyspark.sql.functions as F
import pytest

from pipeline_etl_website_visits_spark.operators.similarity import pq_adc_topk
from pipeline_etl_website_visits_spark.operators.vector_index import (
    build_ivfpq_index,
    ivfpq_search,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def index_path(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vindex") / "emb_idx")
    out = build_ivfpq_index(emb, path, num_coarse=4)
    assert set(out) == {"codes", "meta"}
    return path


def _rows(df):
    return sorted(
        (r["query_id"], r["vec_id"], r["adc_dist"]) for r in df.collect()
    )


def test_full_probe_matches_fused_adc_exactly(spark, emb, index_path):
    """nprobe == n_cells makes the stored-index search bit-identical to the
    fused encode+search operator (same quantization, codes, int64 ADC
    tables, tie-breaks) — the x84 certificate transfers to the artifact."""
    queries = emb.filter(F.col("vec_id") < 10)
    stored = ivfpq_search(spark, index_path, queries, k=5, nprobe=4)
    fused = pq_adc_topk(queries, emb, k=5)
    assert _rows(stored) == _rows(fused)


def test_search_prunes_partitions_and_never_reencodes(spark, emb, index_path):
    """The search scan must (a) carry a cell partition filter — only probed
    cells' dirs are read — and (b) read ONLY (id, codes, cell): no
    embedding column exists in the plan, so re-encoding is structurally
    impossible."""
    queries = emb.filter(F.col("vec_id") < 3)
    res = ivfpq_search(spark, index_path, queries, k=5, nprobe=1)
    plan = res._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 1, plan  # the codes table only — corpus never scanned
    assert "codes" in scans[0]
    assert "embedding" not in plan, plan
    pf = scans[0].split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert pf.startswith("cell#") and "IN" in pf, plan  # probed cells only
    # pruned search still returns k rows per query, a subset drawn from
    # the probed cells (recall<=1 by construction; exactness certified by
    # the full-probe test)
    per_q = {r["query_id"] for r in res.collect()}
    assert per_q == {0, 1, 2}


def test_search_twice_no_rebuild(spark, emb, index_path):
    """Two searches against one build read the same stored codes — the
    second search runs no encode pass (its plan has no embedding scan) and
    returns identical results."""
    queries = emb.filter(F.col("vec_id") < 5)
    r1 = _rows(ivfpq_search(spark, index_path, queries, k=3, nprobe=4))
    r2 = _rows(ivfpq_search(spark, index_path, queries, k=3, nprobe=4))
    assert r1 == r2 and len(r1) == 5 * 3


def test_warehouse_roundtrip(spark, emb, tmp_path):
    from pipeline_etl_website_visits_spark.etl.load import Warehouse

    wh = Warehouse(spark, str(tmp_path / "whv"))
    wh.write_vector_index(emb, name="docs", num_coarse=4)
    res = wh.search_vector_index(emb.filter(F.col("vec_id") < 2), name="docs", k=2)
    got = res.collect()
    assert {r["query_id"] for r in got} == {0, 1}
    # a query's own vector is its nearest neighbor at distance 0
    self_hits = {r["query_id"] for r in got if r["vec_id"] == r["query_id"] and r["adc_dist"] == 0}
    assert self_hits == {0, 1}


def test_append_then_search_equals_full_rebuild(spark, emb, tmp_path):
    """Steady-state ingestion: append a batch to an existing index; the
    search answers over old+new vectors and is bit-identical to an index
    built over the union (the codebook is frozen by contract, so encode
    order cannot matter)."""
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        append_to_ivfpq_index,
        index_cell_stats,
    )

    base = emb.filter(F.col("vec_id") < 400)
    batch = emb.filter(F.col("vec_id") >= 400)
    p_inc = str(tmp_path / "inc")
    p_full = str(tmp_path / "full")
    build_ivfpq_index(base, p_inc, num_coarse=4)
    append_to_ivfpq_index(batch, p_inc)
    build_ivfpq_index(emb, p_full, num_coarse=4)

    queries = emb.filter(F.col("vec_id") < 5)
    inc = _rows(ivfpq_search(spark, p_inc, queries, k=4, nprobe=4))
    full = _rows(ivfpq_search(spark, p_full, queries, k=4, nprobe=4))
    assert inc == full and len(inc) == 5 * 4
    # appended vectors are represented in the cell stats
    stats = {r["cell"]: r["n_vectors"] for r in index_cell_stats(spark, p_inc).collect()}
    assert sum(stats.values()) == emb.count()


def test_append_requires_committed_index(spark, emb, tmp_path):
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        append_to_ivfpq_index,
    )

    with pytest.raises(ValueError, match="no committed index"):
        append_to_ivfpq_index(emb, str(tmp_path / "nope"))


def test_append_applied_key_is_redo_safe(spark, emb, tmp_path):
    """Re-running an append with the same applied_key is a no-op — the
    at-least-once ingestion scenario cannot double-insert codes (which
    would consume top-k slots with duplicates)."""
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        append_to_ivfpq_index,
        index_cell_stats,
    )

    base = emb.filter(F.col("vec_id") < 400)
    batch = emb.filter(F.col("vec_id") >= 400)
    p = str(tmp_path / "redo")
    build_ivfpq_index(base, p, num_coarse=4)
    assert append_to_ivfpq_index(batch, p, applied_key="day1") is True
    n1 = sum(r["n_vectors"] for r in index_cell_stats(spark, p).collect())
    # replay: skipped, counts unchanged
    assert append_to_ivfpq_index(batch, p, applied_key="day1") is False
    n2 = sum(r["n_vectors"] for r in index_cell_stats(spark, p).collect())
    assert n1 == n2 == emb.count()
    # a NEW key still appends
    assert append_to_ivfpq_index(batch.limit(0), p, applied_key="day2") is True


def test_append_never_touches_meta(spark, emb, tmp_path):
    """ADVICE r5 (medium): the round-5 append REWROTE meta in place —
    Spark deletes the dir before writing, so a crash in that window
    destroyed centroids, codebook, params and the commit marker at once.
    Meta is now WRITE-ONCE after the build: an applied-key append must
    leave every meta file byte-identical, recording the key in the
    sidecar ledger instead."""
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        append_to_ivfpq_index,
    )

    base = emb.filter(F.col("vec_id") < 400)
    batch = emb.filter(F.col("vec_id") >= 400)
    p = str(tmp_path / "meta_frozen")
    build_ivfpq_index(base, p, num_coarse=4)
    meta_dir = os.path.join(p, "meta")
    before = {
        fn: (os.path.getsize(os.path.join(meta_dir, fn)),
             os.path.getmtime(os.path.join(meta_dir, fn)))
        for fn in sorted(os.listdir(meta_dir))
    }
    assert append_to_ivfpq_index(batch, p, applied_key="day1") is True
    after = {
        fn: (os.path.getsize(os.path.join(meta_dir, fn)),
             os.path.getmtime(os.path.join(meta_dir, fn)))
        for fn in sorted(os.listdir(meta_dir))
    }
    assert before == after  # geometry/commit-marker cannot be lost to a crash
    # the ledger sidecar holds the key, one write-once file per batch
    assert os.path.isfile(os.path.join(p, "applied", "day1.key"))


def test_append_rejects_unsafe_applied_key(spark, emb, tmp_path):
    """Keys are filesystem/SQL-safe by construction ([A-Za-z0-9._-])."""
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        append_to_ivfpq_index,
    )

    p = str(tmp_path / "charset")
    build_ivfpq_index(emb.filter(F.col("vec_id") < 400), p, num_coarse=4)
    for bad in ("a/b", "a'b", "a\x1fb", "", "x" * 201):
        with pytest.raises(ValueError, match="applied_key"):
            append_to_ivfpq_index(emb.limit(0), p, applied_key=bad)


def test_rebuild_resets_applied_ledger(spark, emb, tmp_path, any_commit_backend):
    """A rebuild at the same path is a fresh incarnation: batch keys
    applied to the PREVIOUS incarnation must append again (round 5 got
    this for free by rewriting meta; the sidecar must reset explicitly
    or post-rebuild appends silently no-op and lose the batch). Runs
    under BOTH commit backends (r9): the reset goes through
    reset_applied_keys, which must clear the ledger where it actually
    lives — a filesystem rmtree cannot see an object-store ledger."""
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        append_to_ivfpq_index,
        index_cell_stats,
    )

    base = emb.filter(F.col("vec_id") < 400)
    batch = emb.filter(F.col("vec_id") >= 400)
    p = str(tmp_path / "rebuild")
    build_ivfpq_index(base, p, num_coarse=4)
    assert append_to_ivfpq_index(batch, p, applied_key="day1") is True
    build_ivfpq_index(base, p, num_coarse=4)  # centroid-retrain rebuild
    assert append_to_ivfpq_index(batch, p, applied_key="day1") is True
    n = sum(r["n_vectors"] for r in index_cell_stats(spark, p).collect())
    assert n == emb.count()  # batch present exactly once after rebuild


def test_compact_codes_preserves_search_append_and_ledger(
    spark, emb, tmp_path, any_commit_backend
):
    """Append pileup -> compaction: one file per cell, searches stay
    bit-identical, later appends land in the new generation, and the
    redo ledger survives (replayed batch still no-ops). Runs under BOTH
    commit backends (VERDICT r8 item 2): generation pointer + ledger
    must work with plain-PUT semantics, no rename."""
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        _codes_dir,
        append_to_ivfpq_index,
        compact_ivfpq_codes,
        index_cell_stats,
        ivfpq_search,
    )

    base = emb.filter(F.col("vec_id") < 300)
    b1 = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    b2 = emb.filter(F.col("vec_id") >= 400)
    p = str(tmp_path / "cidx")
    build_ivfpq_index(base, p, num_coarse=4)
    assert append_to_ivfpq_index(b1, p, applied_key="d1")
    assert append_to_ivfpq_index(b2, p, applied_key="d2")
    queries = emb.filter(F.col("vec_id") < 5)
    before = sorted(map(tuple, ivfpq_search(spark, p, queries, k=5, nprobe=4).collect()))

    new_dir = compact_ivfpq_codes(spark, p)
    # one data file per cell dir in the new generation
    for cell in os.listdir(new_dir):
        if not cell.startswith("cell="):
            continue
        files = [f for f in os.listdir(os.path.join(new_dir, cell)) if not f.startswith(("_", "."))]
        assert len(files) == 1, (cell, files)
    assert _codes_dir(p) == new_dir
    after = sorted(map(tuple, ivfpq_search(spark, p, queries, k=5, nprobe=4).collect()))
    assert before == after

    # ledger survived compaction: replay no-ops
    assert append_to_ivfpq_index(b1, p, applied_key="d1") is False
    n = sum(r["n_vectors"] for r in index_cell_stats(spark, p).collect())
    assert n == emb.count()
    # a NEW batch appends into the live (new) generation
    assert append_to_ivfpq_index(b1.limit(3).withColumn("vec_id", F.col("vec_id") + 10_000), p, applied_key="d3")
    assert sum(r["n_vectors"] for r in index_cell_stats(spark, p).collect()) == n + 3


def test_gc_removes_only_dead_generations(spark, emb, tmp_path):
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        _codes_dir,
        compact_ivfpq_codes,
        gc_ivfpq_generations,
        ivfpq_search,
    )

    p = str(tmp_path / "gidx")
    build_ivfpq_index(emb.filter(F.col("vec_id") < 300), p, num_coarse=4)
    compact_ivfpq_codes(spark, p)   # codes_v1 live, codes dead
    compact_ivfpq_codes(spark, p)   # codes_v2 live, codes+v1 dead
    removed = gc_ivfpq_generations(p)
    assert {os.path.basename(r) for r in removed} == {"codes", "codes_v1"}
    assert os.path.basename(_codes_dir(p)) == "codes_v2"
    # index still searches after GC
    q = emb.filter(F.col("vec_id") < 3)
    assert len(ivfpq_search(spark, p, q, k=5, nprobe=4).collect()) > 0
    assert gc_ivfpq_generations(p) == []  # idempotent


def test_compact_folds_in_appends_that_race_the_rewrite(
    spark, emb, tmp_path, any_commit_backend
):
    """An append that lands while compaction is rewriting resolves the OLD
    generation (the pointer hasn't swapped yet) — without the delta fold
    its rows would be ledger-marked applied yet destroyed by GC. The
    rewrite must re-list and fold such files in before the swap."""
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        append_to_ivfpq_index,
        compact_ivfpq_codes,
        gc_ivfpq_generations,
        index_cell_stats,
    )

    base = emb.filter(F.col("vec_id") < 300)
    racer = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 350))
    p = str(tmp_path / "ridx")
    build_ivfpq_index(base, p, num_coarse=4)
    n_base = base.count()

    def racing_append():
        assert append_to_ivfpq_index(racer, p, applied_key="racer") is True

    compact_ivfpq_codes(spark, p, _before_swap=racing_append)
    gc_ivfpq_generations(p)  # destroy the old generation: fold must have copied
    n = sum(r["n_vectors"] for r in index_cell_stats(spark, p).collect())
    assert n == n_base + racer.count()
    # and the ledger still no-ops the replay
    assert append_to_ivfpq_index(racer, p, applied_key="racer") is False


def test_writer_lease_mutual_exclusion_timeout_and_stale_break(tmp_path):
    """The lease primitive itself: exclusive while held, times out rather
    than deadlocks, and breaks a corpse lease left by a dead holder."""
    import threading
    import time

    from pipeline_etl_website_visits_spark.operators import ledger

    d = str(tmp_path / "art")
    acquired = []
    with ledger.writer_lease(d, name="w") as lock:
        assert os.path.exists(lock)
        # a second acquirer times out while we hold it
        with pytest.raises(TimeoutError):
            with ledger.writer_lease(d, name="w", timeout=0.3, poll=0.02):
                pass
        # ...and a blocked acquirer proceeds once we release
        t = threading.Thread(
            target=lambda: (
                ledger.writer_lease(d, name="w", timeout=10).__enter__(),
                acquired.append(time.monotonic()),
            )
        )
        t.start()
        time.sleep(0.3)
        assert not acquired, "acquired while held"
    t.join(timeout=10)
    assert acquired, "never acquired after release"
    # stale corpse: fake an hours-old lease file; a new acquirer breaks it
    os.makedirs(d, exist_ok=True)
    corpse = os.path.join(d, ".w.lease")
    if not os.path.exists(corpse):  # thread's __enter__ left one: adopt it
        with open(corpse, "w") as f:
            f.write("0 0")
    os.utime(corpse, (time.time() - 7200, time.time() - 7200))
    with ledger.writer_lease(d, name="w", timeout=1, stale_after=3600):
        pass


def test_append_blocks_while_compaction_holds_the_lease(spark, emb, tmp_path):
    """An append that starts mid-swap (the compactor holds the writer
    lease across the final re-list + pointer flip) must BLOCK until the
    swap completes, then land in the live generation — never in the one
    about to be orphaned."""
    import threading
    import time

    from pipeline_etl_website_visits_spark.operators import ledger
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        append_to_ivfpq_index,
        index_cell_stats,
    )

    p = str(tmp_path / "lidx")
    base = emb.filter(F.col("vec_id") < 300)
    build_ivfpq_index(base, p, num_coarse=4)
    racer = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 350))
    done = []
    t = threading.Thread(
        target=lambda: done.append(
            append_to_ivfpq_index(racer, p, applied_key="late")
        )
    )
    with ledger.writer_lease(p, name="codes-writer"):
        t.start()
        time.sleep(1.0)
        assert t.is_alive() and not done, "append proceeded under a held lease"
    t.join(timeout=120)
    assert done == [True]
    n = sum(r["n_vectors"] for r in index_cell_stats(spark, p).collect())
    assert n == base.count() + racer.count()


def test_concurrent_appends_and_destructive_compaction_lose_nothing(spark, emb, tmp_path):
    """The end-to-end race golden, with remove_old=True (the data-loss
    path): appends fired WHILE a destructive compaction runs must all
    survive into the live generation — whichever side wins the lease —
    and their ledger markers must still no-op replays."""
    import threading

    from pipeline_etl_website_visits_spark.operators.vector_index import (
        append_to_ivfpq_index,
        compact_ivfpq_codes,
        index_cell_stats,
    )

    p = str(tmp_path / "cidx")
    base = emb.filter(F.col("vec_id") < 250)
    build_ivfpq_index(base, p, num_coarse=4)
    batches = [
        emb.filter((F.col("vec_id") >= 250 + 50 * i) & (F.col("vec_id") < 300 + 50 * i))
        for i in range(3)
    ]
    counts = [b.count() for b in batches]
    threads = [
        threading.Thread(
            target=append_to_ivfpq_index,
            args=(b, p),
            kwargs={"applied_key": f"race-{i}"},
        )
        for i, b in enumerate(batches)
    ]
    for t in threads:
        t.start()
    compact_ivfpq_codes(spark, p, remove_old=True)
    for t in threads:
        t.join(timeout=180)
    # every batch exactly once, regardless of interleave
    n = sum(r["n_vectors"] for r in index_cell_stats(spark, p).collect())
    assert n == base.count() + sum(counts)
    for i, b in enumerate(batches):
        assert append_to_ivfpq_index(b, p, applied_key=f"race-{i}") is False


def test_writer_lease_survives_directory_removal_while_queued(tmp_path):
    """A destructive compaction (remove_old=True) deletes the location a
    queued appender is polling: the waiter must recover — recreate, acquire,
    and let the caller's re-check-after-acquire see the swap — not crash
    with FileNotFoundError on the vanished directory."""
    import shutil
    import threading
    import time

    from pipeline_etl_website_visits_spark.operators import ledger

    d = str(tmp_path / "doomed")
    outcome = []

    def waiter():
        try:
            with ledger.writer_lease(d, name="w", timeout=30):
                outcome.append("acquired")
        except Exception as e:  # noqa: BLE001 - the failure mode under test
            outcome.append(repr(e))

    with ledger.writer_lease(d, name="w"):
        t = threading.Thread(target=waiter)
        t.start()
        time.sleep(0.3)  # waiter is polling the held lease
        shutil.rmtree(d)  # the remove_old path: directory AND lock vanish
    t.join(timeout=30)
    assert outcome == ["acquired"], outcome


def test_concurrent_compactions_serialize_on_the_compactor_lease(spark, emb, tmp_path):
    """Two compactions at once (round-7 review): without the compactor
    lease both resolve the same current generation, pick the same
    codes_v<k+1> name, and the loser's pointer swap discards whatever the
    winner folded. Serialized, both complete, generations chain, and an
    append folded by whichever ran first survives GC."""
    import threading

    from pipeline_etl_website_visits_spark.operators.vector_index import (
        append_to_ivfpq_index,
        compact_ivfpq_codes,
        gc_ivfpq_generations,
        index_cell_stats,
    )

    p = str(tmp_path / "ccidx")
    base = emb.filter(F.col("vec_id") < 250)
    build_ivfpq_index(base, p, num_coarse=4)
    racer = emb.filter((F.col("vec_id") >= 250) & (F.col("vec_id") < 300))
    done = []
    t_append = threading.Thread(
        target=lambda: done.append(append_to_ivfpq_index(racer, p, applied_key="cc"))
    )
    t_append.start()
    threads = [
        threading.Thread(target=compact_ivfpq_codes, args=(spark, p)) for _ in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads + [t_append]:
        t.join(timeout=300)
    assert done == [True]
    gc_ivfpq_generations(p)  # destroys every non-live generation
    n = sum(r["n_vectors"] for r in index_cell_stats(spark, p).collect())
    assert n == base.count() + racer.count()
    assert append_to_ivfpq_index(racer, p, applied_key="cc") is False


def test_writer_lease_heartbeat_keeps_long_live_hold(tmp_path):
    """A LIVE holder whose hold exceeds stale_after must NOT be broken
    (ADVICE r7: compactions legitimately hold for hours at 100 TB): the
    holder heartbeats the lease, so staleness means 'no heartbeat', not
    'long hold'. A waiter behind it times out with a retry hint instead
    of stealing the lease."""
    import time

    from pipeline_etl_website_visits_spark.operators import ledger

    d = str(tmp_path / "art")
    with ledger.writer_lease(d, name="w", stale_after=0.2) as lock:
        time.sleep(0.8)  # 4x stale_after: without heartbeats this is a corpse
        with pytest.raises(TimeoutError, match="retry"):
            with ledger.writer_lease(d, name="w", timeout=0.4, poll=0.02, stale_after=0.2):
                pass
        assert os.path.exists(lock), "live holder's lease was destroyed"
    # release stops the heartbeat: the file is gone and a new acquire wins
    with ledger.writer_lease(d, name="w", timeout=1, stale_after=0.2):
        pass


def test_commit_backend_seam_routes_all_primitives(tmp_path):
    """Every commit decision (lease create/break/heartbeat, applied-key
    publish, generation-pointer publish) flows through the process-wide
    CommitBackend — swapping it retargets them all without touching
    operator code (the object-store seam, VERDICT r7 item 1)."""
    from pipeline_etl_website_visits_spark.operators import ledger

    calls = []

    class Spy(ledger.LocalCommitBackend):
        def create_exclusive(self, path, payload):
            calls.append(("create", path))
            super().create_exclusive(path, payload)

        def publish(self, path, payload):
            calls.append(("publish", path))
            super().publish(path, payload)

        def remove(self, path):
            calls.append(("remove", path))
            super().remove(path)

    prev = ledger.set_commit_backend(Spy())
    try:
        d = str(tmp_path / "art")
        with ledger.writer_lease(d, name="w"):
            ledger.record_applied_key(os.path.join(d, "applied"), "b1")
        ledger.publish_pointer(os.path.join(d, "ptr"), "gen_v1")
        assert ledger.read_pointer(os.path.join(d, "ptr")) == "gen_v1"
        assert ledger.applied_keys(os.path.join(d, "applied")) == {"b1"}
    finally:
        ledger.set_commit_backend(prev)
    kinds = [k for k, _ in calls]
    assert kinds.count("create") == 1 and kinds.count("publish") == 2
    assert kinds.count("remove") == 1
    # and no stray direct-os commit happened after the swap back
    assert all(str(tmp_path) in p for _, p in calls)


def test_writer_lease_release_is_ownership_checked(tmp_path):
    """A holder suspended past stale_after can be legitimately broken and
    superseded; its (late) release must not delete the successor's lease.
    Simulated by swapping the lease file's content mid-hold."""
    from pipeline_etl_website_visits_spark.operators import ledger

    d = str(tmp_path / "art")
    with ledger.writer_lease(d, name="w") as lock:
        with open(lock, "wb") as f:  # a successor took over after a break
            f.write(b"someone else")
    assert os.path.exists(lock), "release deleted a lease it no longer owned"
    os.remove(lock)
    # normal path still releases
    with ledger.writer_lease(d, name="w") as lock:
        pass
    assert not os.path.exists(lock)


def test_publish_crash_before_replace_preserves_old_pointer(tmp_path):
    """Crash-inject the publish primitive: dying AFTER the scratch write
    but BEFORE the atomic swap must leave the previously committed value
    intact and readable, and the retry must complete normally — the
    contract every generation pointer and applied-key marker rides on."""
    from pipeline_etl_website_visits_spark.operators import ledger

    class CrashOnce(ledger.LocalCommitBackend):
        def __init__(self):
            self.armed = True

        def publish(self, path, payload):
            if self.armed:
                self.armed = False
                with open(f"{path}.tmp.crashed", "wb") as f:
                    f.write(payload)  # scratch landed, swap never did
                raise OSError("injected crash between write and replace")
            super().publish(path, payload)

    ptr = str(tmp_path / "ptr")
    prev = ledger.set_commit_backend(CrashOnce())
    try:
        ledger.set_commit_backend(prev)
        ledger.publish_pointer(ptr, "gen_v1")  # committed under the real backend
        ledger.set_commit_backend(CrashOnce())
        import pytest

        with pytest.raises(OSError, match="injected"):
            ledger.publish_pointer(ptr, "gen_v2")
        assert ledger.read_pointer(ptr) == "gen_v1", "torn publish"
        ledger.publish_pointer(ptr, "gen_v2")  # retry succeeds
        assert ledger.read_pointer(ptr) == "gen_v2"
    finally:
        ledger.set_commit_backend(prev)


def test_two_process_append_races_destructive_compaction(spark, emb, tmp_path):
    """VERDICT r9 item 3: the vector index's lease/pointer protocol across
    TWO DRIVER PROCESSES (separate JVMs, same index path on disk) — the
    warehouse merge and gram append already have real-subprocess goldens;
    this closes the triplet.

    Driver B (a real subprocess) appends a batch while driver A (this
    session) is mid-compaction (new generation written, pointer swap not
    yet taken — the _before_swap seam parks A until B commits). B's batch
    resolves the OLD generation's pointer, so without the final delta fold
    under the codes-writer lease, remove_old=True would destroy its only
    copy. At the end: ONE consistent generation pointer, base + batch all
    present, and a second run of B no-ops on the replayed key."""
    import os
    import subprocess
    import sys
    import time

    from pipeline_etl_website_visits_spark.operators import ledger
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        _codes_dir,
        compact_ivfpq_codes,
        index_cell_stats,
    )

    base = emb.filter(F.col("vec_id") < 300)
    p = str(tmp_path / "xpidx")
    sentinel = str(tmp_path / "b_done")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "driver_b.py"
    script.write_text(
        f"""
import sys
sys.path.insert(0, {repr(repo_root)})
import pyspark.sql.functions as F
from pipeline_etl_website_visits_spark.session import get_spark
from pipeline_etl_website_visits_spark.operators.vector_index import (
    append_to_ivfpq_index,
)

spark = get_spark(
    "driver-b", master="local[2]", shuffle_partitions=2,
    extra_conf={{"spark.ui.enabled": "false",
                 "spark.sql.warehouse.dir": {repr(str(tmp_path / "wh_b"))}}},
)
spark.sparkContext.setLogLevel("ERROR")
emb = spark.read.parquet({repr(f"{SF_DIR}/embeddings.parquet")})
batch = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
ok = append_to_ivfpq_index(batch, {repr(p)}, applied_key="xpb1")
print("APPENDED", ok, flush=True)
open({repr(sentinel)}, "w").write("done")
spark.stop()
"""
    )

    def run_b():
        return subprocess.run(
            [sys.executable, str(script)], capture_output=True, text=True, timeout=300
        )

    build_ivfpq_index(base, p, num_coarse=4)
    n_base = base.count()
    results = {}

    def park_until_b_commits():
        results["b1"] = run_b()
        deadline = time.monotonic() + 300
        while not os.path.exists(sentinel) and time.monotonic() < deadline:
            time.sleep(0.2)

    new_dir = compact_ivfpq_codes(
        spark, p, remove_old=True, _before_swap=park_until_b_commits
    )
    assert "APPENDED True" in results["b1"].stdout, results["b1"].stderr[-2000:]
    # one consistent generation: pointer names the new dir, old one is gone
    assert _codes_dir(p) == new_dir
    assert not os.path.exists(os.path.join(p, "codes")), (
        "dead generation survived remove_old"
    )
    # B's rows were folded in before the swap — base + batch all present
    n = sum(r["n_vectors"] for r in index_cell_stats(spark, p).collect())
    assert n == n_base + 100, (n, n_base)
    assert "xpb1" in ledger.applied_keys(os.path.join(p, "applied"))
    # searches answer through A's session over the folded index
    q = emb.filter(F.col("vec_id") < 3)
    assert len(ivfpq_search(spark, p, q, k=5, nprobe=4).collect()) > 0
    # driver B round 2: the replayed key no-ops cross-process
    os.remove(sentinel)
    b2 = run_b()
    assert "APPENDED False" in b2.stdout, b2.stderr[-2000:]
    assert sum(r["n_vectors"] for r in index_cell_stats(spark, p).collect()) == n


def test_compact_crash_before_pointer_swap_leaves_old_generation_live(
    spark, emb, tmp_path
):
    """Crash-inject the compaction's generation-pointer publish: the
    rewrite completed (codes_v1 on disk) but the swap never happened.
    The OLD generation must stay live and complete (searches identical,
    appends land there, ledger intact), GC must sweep the orphaned new
    generation — it is unreferenced — and a retry compaction must
    complete normally."""
    from pipeline_etl_website_visits_spark.operators import ledger
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        _codes_dir,
        append_to_ivfpq_index,
        compact_ivfpq_codes,
        gc_ivfpq_generations,
        index_cell_stats,
    )

    class CrashOnSwap(ledger.LocalCommitBackend):
        armed = True

        def publish(self, path, payload):
            if self.armed and path.endswith("codes_current"):
                self.armed = False
                raise OSError("injected crash before the generation swap")
            super().publish(path, payload)

    base = emb.filter(F.col("vec_id") < 300)
    b1 = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    p = str(tmp_path / "cidx")
    build_ivfpq_index(base, p, num_coarse=4)
    assert append_to_ivfpq_index(b1, p, applied_key="d1")
    queries = emb.filter(F.col("vec_id") < 5)
    before = sorted(map(tuple, ivfpq_search(spark, p, queries, k=5, nprobe=4).collect()))
    old_dir = _codes_dir(p)

    prev = ledger.set_commit_backend(CrashOnSwap())
    try:
        with pytest.raises(OSError, match="injected"):
            compact_ivfpq_codes(spark, p, remove_old=True)
        # old generation still live and complete
        assert _codes_dir(p) == old_dir
        after = sorted(map(tuple, ivfpq_search(spark, p, queries, k=5, nprobe=4).collect()))
        assert after == before
        # ledger intact: the replay still no-ops; a new append lands in OLD
        assert append_to_ivfpq_index(b1, p, applied_key="d1") is False
        n_before = sum(r["n_vectors"] for r in index_cell_stats(spark, p).collect())
        assert append_to_ivfpq_index(
            b1.limit(2).withColumn("vec_id", F.col("vec_id") + 50_000), p, applied_key="d2"
        )
        assert sum(r["n_vectors"] for r in index_cell_stats(spark, p).collect()) == n_before + 2
        # GC sweeps the orphaned (unreferenced) rewrite
        removed = gc_ivfpq_generations(p)
        assert any(os.path.basename(r).startswith("codes_v") for r in removed), removed
        # retry compaction (backend healed: armed consumed) completes and
        # carries EVERYTHING, including the post-crash append
        new_dir = compact_ivfpq_codes(spark, p, remove_old=True)
        assert _codes_dir(p) == new_dir and not os.path.exists(old_dir)
        assert sum(r["n_vectors"] for r in index_cell_stats(spark, p).collect()) == n_before + 2
        final = sorted(map(tuple, ivfpq_search(spark, p, queries, k=5, nprobe=4).collect()))
        assert final == before  # top-k unchanged by the distant new vectors
    finally:
        ledger.set_commit_backend(prev)


def test_append_skip_existing_gates_replayed_and_mixed_batches(spark, emb, tmp_path):
    """skip_existing: a replayed batch (insert landed, marker didn't)
    re-inserts NOTHING; a mixed batch inserts only its novel ids; search
    results stay bit-identical to the exactly-once state."""
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        append_to_ivfpq_index,
        index_cell_stats,
    )

    base = emb.filter(F.col("vec_id") < 300)
    b1 = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    p = str(tmp_path / "gidx")
    build_ivfpq_index(base, p, num_coarse=4)
    assert append_to_ivfpq_index(b1, p, applied_key="k1")
    n1 = sum(r["n_vectors"] for r in index_cell_stats(spark, p).collect())
    q = emb.filter(F.col("vec_id") < 5)
    want = sorted(map(tuple, ivfpq_search(spark, p, q, k=5, nprobe=4).collect()))

    # the crash-window replay: same rows, DIFFERENT key (the first run's
    # marker never landed), gate on -> zero new rows
    assert append_to_ivfpq_index(b1, p, applied_key="k1-retry", skip_existing=True)
    assert sum(r["n_vectors"] for r in index_cell_stats(spark, p).collect()) == n1
    assert sorted(map(tuple, ivfpq_search(spark, p, q, k=5, nprobe=4).collect())) == want

    # mixed batch: half replayed, half novel -> exactly the novel half lands
    novel = emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 450))
    mixed = b1.limit(30).unionByName(novel)
    assert append_to_ivfpq_index(mixed, p, applied_key="k2", skip_existing=True)
    n2 = sum(r["n_vectors"] for r in index_cell_stats(spark, p).collect())
    assert n2 == n1 + novel.count()
    # and WITHOUT the gate the same replay would have duplicated (contract
    # check: the default stays append-blind)
    assert append_to_ivfpq_index(b1.limit(10), p, applied_key="k3")
    assert sum(r["n_vectors"] for r in index_cell_stats(spark, p).collect()) == n2 + 10


# ---------------------------------------------------------------------------
# IVF-Flat (exact vectors per cell) — the dense half of served hybrid
# retrieval (x173)
# ---------------------------------------------------------------------------


def test_ivfflat_full_probe_matches_cosine_topk_exactly(spark, emb, tmp_path):
    """Full-probe IVF-Flat search is bit-identical to cosine_topk over the
    original corpus — it delegates to that kernel over the stored float64
    vectors (exact float->double widening), so the certificate transfers."""
    from pipeline_etl_website_visits_spark.operators.similarity import cosine_topk
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        build_ivfflat_index,
        ivfflat_search,
    )

    path = str(tmp_path / "flat_idx")
    out = build_ivfflat_index(emb, path, num_coarse=4)
    assert set(out) == {"vectors", "meta"}
    queries = emb.filter(F.col("vec_id") < 10)
    stored = ivfflat_search(spark, path, queries, k=5, with_rank=True)
    direct = cosine_topk(queries, emb, k=5, with_rank=True)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(stored) == key(direct)


def test_ivfflat_pruned_search_reads_only_probed_cells(spark, emb, tmp_path):
    """nprobe=1: the stored-vectors scan carries a cell partition filter
    (only the probed cells' dirs are read) and still returns k rows per
    query drawn from those cells."""
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        build_ivfflat_index,
        ivfflat_search,
    )

    path = str(tmp_path / "flat_idx_pruned")
    build_ivfflat_index(emb, path, num_coarse=4)
    queries = emb.filter(F.col("vec_id") < 3)
    res = ivfflat_search(spark, path, queries, k=5, nprobe=1)
    plan = res._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scans, plan
    for s in scans:
        pf = s.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
        # single-cell isin folds to an equality predicate; either way the
        # filter sits in PartitionFilters (pruned dirs), not DataFilters
        assert "cell#" in pf and ("IN" in pf or " = " in pf), plan
    got = res.collect()
    assert {r["query_id"] for r in got} == {0, 1, 2}
    assert all(1 <= len([r for r in got if r["query_id"] == q]) <= 5 for q in (0, 1, 2))


def test_ivfflat_build_requires_coarse_ids(spark, emb, tmp_path):
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        build_ivfflat_index,
    )

    with pytest.raises(ValueError, match="coarse contract"):
        build_ivfflat_index(
            emb.filter(F.col("vec_id") >= 2), str(tmp_path / "bad"), num_coarse=4
        )


def _flat_rows(spark, path, queries, **kw):
    from pipeline_etl_website_visits_spark.operators.vector_index import ivfflat_search

    return sorted(map(tuple, ivfflat_search(spark, path, queries, **kw).collect()))


def test_ivfflat_append_then_search_equals_full_rebuild(spark, emb, tmp_path):
    """IVF-Flat steady-state ingestion (r12 lifecycle parity): append a
    batch to an existing index; a full-probe search over old+new vectors
    is bit-identical to an index built over the union (frozen coarse
    quantizer + exact stored vectors — encode order cannot matter)."""
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        append_to_ivfflat_index,
        build_ivfflat_index,
        ivfflat_cell_stats,
    )

    base = emb.filter(F.col("vec_id") < 400)
    batch = emb.filter(F.col("vec_id") >= 400)
    p_inc = str(tmp_path / "finc")
    p_full = str(tmp_path / "ffull")
    build_ivfflat_index(base, p_inc, num_coarse=4)
    assert append_to_ivfflat_index(batch, p_inc) is True
    build_ivfflat_index(emb, p_full, num_coarse=4)

    queries = emb.filter(F.col("vec_id") < 5)
    assert _flat_rows(spark, p_inc, queries, k=4) == _flat_rows(spark, p_full, queries, k=4)
    stats = {r["cell"]: r["n_vectors"] for r in ivfflat_cell_stats(spark, p_inc).collect()}
    assert sum(stats.values()) == emb.count()


def test_ivfflat_append_requires_committed_index(spark, emb, tmp_path):
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        append_to_ivfflat_index,
    )

    with pytest.raises(ValueError, match="no committed index"):
        append_to_ivfflat_index(emb, str(tmp_path / "fnope"))


def test_ivfflat_append_applied_key_is_redo_safe(spark, emb, tmp_path):
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        append_to_ivfflat_index,
        build_ivfflat_index,
        ivfflat_cell_stats,
    )

    base = emb.filter(F.col("vec_id") < 400)
    batch = emb.filter(F.col("vec_id") >= 400)
    p = str(tmp_path / "fredo")
    build_ivfflat_index(base, p, num_coarse=4)
    assert append_to_ivfflat_index(batch, p, applied_key="day1") is True
    n1 = sum(r["n_vectors"] for r in ivfflat_cell_stats(spark, p).collect())
    assert append_to_ivfflat_index(batch, p, applied_key="day1") is False
    n2 = sum(r["n_vectors"] for r in ivfflat_cell_stats(spark, p).collect())
    assert n1 == n2 == emb.count()
    assert append_to_ivfflat_index(batch.limit(0), p, applied_key="day2") is True


def test_ivfflat_rebuild_resets_applied_ledger(spark, emb, tmp_path, any_commit_backend):
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        append_to_ivfflat_index,
        build_ivfflat_index,
        ivfflat_cell_stats,
    )

    base = emb.filter(F.col("vec_id") < 400)
    batch = emb.filter(F.col("vec_id") >= 400)
    p = str(tmp_path / "frebuild")
    build_ivfflat_index(base, p, num_coarse=4)
    assert append_to_ivfflat_index(batch, p, applied_key="day1") is True
    build_ivfflat_index(base, p, num_coarse=4)
    assert append_to_ivfflat_index(batch, p, applied_key="day1") is True
    n = sum(r["n_vectors"] for r in ivfflat_cell_stats(spark, p).collect())
    assert n == emb.count()


def test_ivfflat_compact_preserves_search_append_and_ledger(
    spark, emb, tmp_path, any_commit_backend
):
    """Append pileup -> compaction under both commit backends: one file
    per cell in the new generation, pointer swapped, searches bit-identical,
    ledger survives (replay no-ops), later appends land in the live
    generation — the compact_ivfpq_codes contract transferred verbatim."""
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        _vectors_dir,
        append_to_ivfflat_index,
        build_ivfflat_index,
        compact_ivfflat_vectors,
        ivfflat_cell_stats,
    )

    base = emb.filter(F.col("vec_id") < 300)
    b1 = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    b2 = emb.filter(F.col("vec_id") >= 400)
    p = str(tmp_path / "fcidx")
    build_ivfflat_index(base, p, num_coarse=4)
    assert append_to_ivfflat_index(b1, p, applied_key="d1")
    assert append_to_ivfflat_index(b2, p, applied_key="d2")
    queries = emb.filter(F.col("vec_id") < 5)
    before = _flat_rows(spark, p, queries, k=5)

    new_dir = compact_ivfflat_vectors(spark, p)
    for cell in os.listdir(new_dir):
        if not cell.startswith("cell="):
            continue
        files = [f for f in os.listdir(os.path.join(new_dir, cell)) if not f.startswith(("_", "."))]
        assert len(files) == 1, (cell, files)
    assert _vectors_dir(p) == new_dir
    assert _flat_rows(spark, p, queries, k=5) == before

    assert append_to_ivfflat_index(b1, p, applied_key="d1") is False
    n = sum(r["n_vectors"] for r in ivfflat_cell_stats(spark, p).collect())
    assert n == emb.count()
    assert append_to_ivfflat_index(
        b1.limit(3).withColumn("vec_id", F.col("vec_id") + 10_000), p, applied_key="d3"
    )
    assert sum(r["n_vectors"] for r in ivfflat_cell_stats(spark, p).collect()) == n + 3


def test_ivfflat_gc_removes_only_dead_generations(spark, emb, tmp_path):
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        _vectors_dir,
        build_ivfflat_index,
        compact_ivfflat_vectors,
        gc_ivfflat_generations,
        ivfflat_search,
    )

    p = str(tmp_path / "fgidx")
    build_ivfflat_index(emb.filter(F.col("vec_id") < 300), p, num_coarse=4)
    compact_ivfflat_vectors(spark, p)
    compact_ivfflat_vectors(spark, p)
    removed = gc_ivfflat_generations(p)
    assert {os.path.basename(r) for r in removed} == {"vectors", "vectors_v1"}
    assert os.path.basename(_vectors_dir(p)) == "vectors_v2"
    q = emb.filter(F.col("vec_id") < 3)
    assert len(ivfflat_search(spark, p, q, k=5).collect()) > 0
    assert gc_ivfflat_generations(p) == []


def test_ivfflat_compact_folds_racing_appends(spark, emb, tmp_path, any_commit_backend):
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        append_to_ivfflat_index,
        build_ivfflat_index,
        compact_ivfflat_vectors,
        gc_ivfflat_generations,
        ivfflat_cell_stats,
    )

    base = emb.filter(F.col("vec_id") < 300)
    racer = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 350))
    p = str(tmp_path / "fridx")
    build_ivfflat_index(base, p, num_coarse=4)
    n_base = base.count()

    def racing_append():
        assert append_to_ivfflat_index(racer, p, applied_key="racer") is True

    compact_ivfflat_vectors(spark, p, _before_swap=racing_append)
    gc_ivfflat_generations(p)
    n = sum(r["n_vectors"] for r in ivfflat_cell_stats(spark, p).collect())
    assert n == n_base + racer.count()
    assert append_to_ivfflat_index(racer, p, applied_key="racer") is False


def test_ivfflat_append_skip_existing_gates_replayed_batches(spark, emb, tmp_path):
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        append_to_ivfflat_index,
        build_ivfflat_index,
        ivfflat_cell_stats,
    )

    base = emb.filter(F.col("vec_id") < 300)
    b1 = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    p = str(tmp_path / "fskip")
    build_ivfflat_index(base, p, num_coarse=4)
    assert append_to_ivfflat_index(b1, p, applied_key="k1")
    n1 = sum(r["n_vectors"] for r in ivfflat_cell_stats(spark, p).collect())
    q = emb.filter(F.col("vec_id") < 5)
    want = _flat_rows(spark, p, q, k=5)

    # crash-window replay: same rows, different key, gate on -> no new rows
    assert append_to_ivfflat_index(b1, p, applied_key="k1-retry", skip_existing=True)
    assert sum(r["n_vectors"] for r in ivfflat_cell_stats(spark, p).collect()) == n1
    assert _flat_rows(spark, p, q, k=5) == want

    # mixed batch: only the novel half lands
    novel = emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 450))
    mixed = b1.limit(30).unionByName(novel)
    assert append_to_ivfflat_index(mixed, p, applied_key="k2", skip_existing=True)
    n2 = sum(r["n_vectors"] for r in ivfflat_cell_stats(spark, p).collect())
    assert n2 == n1 + novel.count()


def test_served_queries_survive_append_compact_cycle(spark, tmp_path):
    """x173/x177's serving contract across the lifecycle: after an
    append of vectors the search already saw (skip_existing replay) and a
    compaction (generation pointer swap), the pruned ivfflat_search the
    two queries run returns bit-identical rows — the artifact's values
    never move under maintenance."""
    from pipeline_etl_website_visits_spark.operators.vector_index import (
        append_to_ivfflat_index,
        build_ivfflat_index,
        compact_ivfflat_vectors,
        gc_ivfflat_generations,
        ivfflat_search,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    p = str(tmp_path / "serve_idx")
    build_ivfflat_index(emb, p, num_coarse=4)
    queries = emb.filter(F.col("vec_id") % 100 == 7)  # x177's probe shape
    before = sorted(map(tuple, ivfflat_search(spark, p, queries, k=5, nprobe=2).collect()))

    # maintenance cycle: replayed append (gated), compact, GC
    assert append_to_ivfflat_index(emb.limit(50), p, applied_key="replay", skip_existing=True)
    compact_ivfflat_vectors(spark, p)
    gc_ivfflat_generations(p)
    after = sorted(map(tuple, ivfflat_search(spark, p, queries, k=5, nprobe=2).collect()))
    assert after == before
