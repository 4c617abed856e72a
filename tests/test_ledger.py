"""Backend-generic commit-protocol goldens (VERDICT r8 item 2).

Every test here runs twice via the ``any_commit_backend`` fixture: once on
the default POSIX :class:`LocalCommitBackend` and once on
:class:`InMemoryObjectStoreBackend`, whose primitives are implemented the
way the documented S3/GCS mapping says (conditional PUT, plain PUT, no
atomic rename, no directories, metadata-refresh touch). Assertions use
ONLY backend primitives — no ``os.path`` on lease/pointer/ledger state —
so a pass proves the protocol itself is portable, not just its POSIX
incarnation.
"""

import threading
import time

import pytest

from pipeline_etl_website_visits_spark.operators import ledger


def _lease_path(d, name="w"):
    import os

    return os.path.join(d, f".{name}.lease")


def test_lease_exclusion_and_handoff(tmp_path, any_commit_backend):
    d = str(tmp_path / "art")
    acquired = []
    with ledger.writer_lease(d, name="w") as lock:
        assert any_commit_backend.read(lock)  # lease exists, has a token
        with pytest.raises(TimeoutError):
            with ledger.writer_lease(d, name="w", timeout=0.3, poll=0.02):
                pass
        t = threading.Thread(
            target=lambda: (
                ledger.writer_lease(d, name="w", timeout=10).__enter__(),
                acquired.append(1),
            )
        )
        t.start()
        time.sleep(0.3)
        assert not acquired, "acquired while held"
    t.join(timeout=10)
    assert acquired, "never acquired after release"


def test_lease_stale_break_and_heartbeat(tmp_path, any_commit_backend):
    d = str(tmp_path / "art")
    any_commit_backend.ensure_dir(d)
    # corpse: a lease created by a dead holder (no heartbeat ever again)
    any_commit_backend.create_exclusive(_lease_path(d), b"corpse")
    time.sleep(0.5)
    # a new acquirer breaks it once past stale_after...
    with ledger.writer_lease(d, name="w", timeout=5, poll=0.02, stale_after=0.2):
        pass
    # ...but a LIVE holder's heartbeat keeps refreshing mtime, so a waiter
    # times out instead of breaking it
    with ledger.writer_lease(d, name="w", stale_after=0.2) as lock:
        time.sleep(0.8)  # 4x stale_after: a corpse by mtime, alive by beat
        with pytest.raises(TimeoutError, match="retry"):
            with ledger.writer_lease(d, name="w", timeout=0.4, poll=0.02, stale_after=0.2):
                pass
        any_commit_backend.read(lock)  # still there: the live holder survived


def test_lease_release_is_ownership_checked(tmp_path, any_commit_backend):
    d = str(tmp_path / "art")
    with ledger.writer_lease(d, name="w") as lock:
        # a successor took over after a staleness break mid-hold
        any_commit_backend.publish(lock, b"someone else")
    assert any_commit_backend.read(lock) == b"someone else", (
        "release deleted a lease it no longer owned"
    )
    any_commit_backend.remove(lock)
    with ledger.writer_lease(d, name="w") as lock:
        pass
    with pytest.raises(FileNotFoundError):
        any_commit_backend.read(lock)  # normal path still releases


def test_pointer_publish_read_roundtrip(tmp_path, any_commit_backend):
    import os

    ptr = os.path.join(str(tmp_path), "gen_ptr")
    assert ledger.read_pointer(ptr) is None
    ledger.publish_pointer(ptr, "codes_v1")
    assert ledger.read_pointer(ptr) == "codes_v1"
    ledger.publish_pointer(ptr, "codes_v2")  # overwrite, no rename needed
    assert ledger.read_pointer(ptr) == "codes_v2"


def test_applied_key_ledger_roundtrip_and_reset(tmp_path, any_commit_backend):
    import os

    led = os.path.join(str(tmp_path), "applied")
    assert ledger.applied_keys(led) == set()
    ledger.record_applied_key(led, "batch-1")
    ledger.record_applied_key(led, "batch-2")
    ledger.record_applied_key(led, "batch-2")  # idempotent
    assert ledger.applied_keys(led) == {"batch-1", "batch-2"}
    ledger.reset_applied_keys(led)  # rebuild: fresh incarnation
    assert ledger.applied_keys(led) == set()


def test_objectstore_backend_has_no_posixisms(tmp_path):
    """The object-store profile itself: conditional PUT loses the race,
    LIST is prefix-scoped, and nothing requires a directory to exist."""
    b = ledger.InMemoryObjectStoreBackend()
    b.create_exclusive("/idx/.w.lease", b"t1")
    with pytest.raises(FileExistsError):
        b.create_exclusive("/idx/.w.lease", b"t2")
    assert b.read("/idx/.w.lease") == b"t1"
    # publish into a "directory" nobody created (flat namespace)
    b.publish("/never/made/ptr", b"codes_v1")
    assert b.read("/never/made/ptr") == b"codes_v1"
    b.publish("/idx/applied/a.key", b"a")
    b.publish("/idx/applied/b.key", b"b")
    b.publish("/idx/applied/sub/deep.key", b"x")  # not a DIRECT child
    assert sorted(b.list_names("/idx/applied")) == ["a.key", "b.key"]
    old = b.mtime("/idx/.w.lease")
    time.sleep(0.02)
    b.touch("/idx/.w.lease")
    assert b.mtime("/idx/.w.lease") > old
    b.remove("/idx/.w.lease")
    with pytest.raises(FileNotFoundError):
        b.touch("/idx/.w.lease")  # a broken lease must not resurrect


def test_remove_if_is_compare_and_delete(tmp_path, any_commit_backend):
    import os

    p = os.path.join(str(tmp_path), "lease")
    any_commit_backend.create_exclusive(p, b"mine")
    assert any_commit_backend.remove_if(p, b"theirs") is False
    assert any_commit_backend.read(p) == b"mine"  # wrong token: untouched
    assert any_commit_backend.remove_if(p, b"mine") is True
    with pytest.raises(FileNotFoundError):
        any_commit_backend.read(p)
    assert any_commit_backend.remove_if(p, b"mine") is False  # gone: False, no raise


def test_lease_mutual_exclusion_soak(tmp_path, any_commit_backend):
    """Randomized interleaving soak: 8 threads x 6 acquisitions with
    jittered hold times — at no instant may two threads believe they
    hold the same lease. stale_after is far above the hold times, so a
    break can only fire on a genuine corpse (there are none here); the
    soak catches protocol regressions (a release deleting a successor,
    a break destroying a live holder) as a mutual-exclusion violation."""
    import os
    import random
    import threading
    import time

    d = str(tmp_path / "art")
    active: list[int] = []
    violations: list[str] = []
    guard = threading.Lock()

    def worker(i: int) -> None:
        rng = random.Random(i)
        for _ in range(6):
            with ledger.writer_lease(d, name="soak", poll=0.003, stale_after=30):
                with guard:
                    active.append(i)
                    if len(active) != 1:
                        violations.append(f"concurrent holders: {active}")
                time.sleep(rng.uniform(0.001, 0.01))
                with guard:
                    active.remove(i)
            time.sleep(rng.uniform(0, 0.005))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not violations, violations[:3]
    assert not active
    # the lease file is gone: the last release cleaned up after itself
    import pytest

    with pytest.raises(FileNotFoundError):
        any_commit_backend.read(os.path.join(d, ".soak.lease"))


def test_retrying_backend_disambiguation_rules(tmp_path):
    """RetryingBackend's per-primitive ambiguity rules (VERDICT r9
    item 4), pinned directly: a create_exclusive whose FIRST attempt
    applied-but-failed is recognized as OUR win on retry (payload
    read-back); a GENUINE lost race still raises FileExistsError; a
    remove whose first attempt applied treats retry-absence as success;
    exhausted transient retries surface the error."""
    from tests.conftest import FlakyBackend

    # applied-but-response-lost on every first (op, path): the ambiguous mode
    store = ledger.InMemoryObjectStoreBackend()
    b = ledger.RetryingBackend(FlakyBackend(store, when="after"), backoff=0.0)
    b.create_exclusive("k/lease", b"tok-A")  # first attempt applies, then 503
    assert b.read("k/lease") == b"tok-A"  # disambiguated as our own win
    # a DIFFERENT payload is a genuine lost race — must still raise
    with pytest.raises(FileExistsError):
        b.create_exclusive("k/lease", b"tok-B")
    # remove: first attempt applies then fails; the retry's absence = success
    b.remove("k/lease")
    with pytest.raises(FileNotFoundError):
        b.read("k/lease")
    # a remove of something that never existed is still an error
    with pytest.raises(FileNotFoundError):
        ledger.RetryingBackend(store).remove("k/never")

    class AlwaysDown(ledger.InMemoryObjectStoreBackend):
        def publish(self, path, payload):
            raise ledger.TransientStoreError("503")

    with pytest.raises(ledger.TransientStoreError):
        ledger.RetryingBackend(AlwaysDown(), attempts=3, backoff=0.0).publish(
            "p", b"v"
        )
    with pytest.raises(ValueError, match="attempts"):
        ledger.RetryingBackend(store, attempts=0)


def test_retrying_create_exclusive_raises_when_rerace_exhausts(tmp_path):
    """Review r10 finding: exhausting attempts through the
    FileExistsError->read-FileNotFoundError re-race path must RAISE, not
    fall off the loop returning None — a silent None reads as 'lease
    acquired' to writer_lease with no lease file on disk."""

    class FlappingStore(ledger.InMemoryObjectStoreBackend):
        """Every create sees the slot occupied; every read-back sees it
        already released (a fast acquire/release churn)."""

        def create_exclusive(self, path, payload):
            raise FileExistsError(path)

        def read(self, path):
            raise FileNotFoundError(path)

    b = ledger.RetryingBackend(FlappingStore(), attempts=3, backoff=0.0)
    # first attempt: genuine FileExistsError propagates (no ambiguity yet)
    with pytest.raises(FileExistsError):
        b.create_exclusive("k", b"tok")

    class FlapAfterTransient(FlappingStore):
        def __init__(self):
            super().__init__()
            self.calls = 0

        def create_exclusive(self, path, payload):
            self.calls += 1
            if self.calls == 1:
                raise ledger.TransientStoreError("503")
            raise FileExistsError(path)

    with pytest.raises(ledger.TransientStoreError, match="did not converge"):
        ledger.RetryingBackend(FlapAfterTransient(), attempts=3, backoff=0.0).create_exclusive(
            "k", b"tok"
        )


def test_http_backend_wire_semantics():
    """The loopback wire backend end-to-end: every primitive over real
    sockets with the documented status mapping — conditional PUT (412 on
    exists), plain PUT, GET/404, native conditional DELETE, touch
    heartbeat, prefix LIST — and a threaded conditional-PUT race where
    exactly one writer wins."""
    import threading

    from pipeline_etl_website_visits_spark.operators.objectstore_http import (
        HttpObjectStoreBackend,
        ObjectStoreHttpServer,
    )

    server = ObjectStoreHttpServer()
    try:
        b = HttpObjectStoreBackend(server.start())
        b.create_exclusive("/idx/.w.lease", b"t1")
        with pytest.raises(FileExistsError):
            b.create_exclusive("/idx/.w.lease", b"t2")
        assert b.read("/idx/.w.lease") == b"t1"
        b.publish("/never/made/ptr", b"codes_v1")
        assert b.read("/never/made/ptr") == b"codes_v1"
        b.publish("/idx/applied/a.key", b"a")
        b.publish("/idx/applied/sub/deep.key", b"x")
        assert b.list_names("/idx/applied") == ["a.key"]
        old = b.mtime("/idx/.w.lease")
        time.sleep(0.02)
        b.touch("/idx/.w.lease")
        assert b.mtime("/idx/.w.lease") > old
        assert b.remove_if("/idx/.w.lease", b"wrong") is False
        assert b.remove_if("/idx/.w.lease", b"t1") is True
        with pytest.raises(FileNotFoundError):
            b.read("/idx/.w.lease")
        with pytest.raises(FileNotFoundError):
            b.touch("/idx/.w.lease")
        with pytest.raises(FileNotFoundError):
            b.remove("/idx/.w.lease")

        # threaded conditional-PUT race: exactly one winner over the wire
        wins, errs = [], []

        def contend(tok):
            try:
                b.create_exclusive("/race/lock", tok)
                wins.append(tok)
            except FileExistsError:
                pass
            except Exception as e:  # pragma: no cover
                errs.append(e)

        ts = [
            threading.Thread(target=contend, args=(f"t{i}".encode(),))
            for i in range(8)
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs and len(wins) == 1
        assert b.read("/race/lock") == wins[0]
    finally:
        server.stop()


def test_http_backend_503_maps_to_transient_and_retry_composes():
    """Server-side 503s surface as TransientStoreError (never a protocol
    error), and RetryingBackend over the wire absorbs both injection
    classes: 'before' (request never applied — plain retry) and 'after'
    (applied, response lost — create_exclusive read-back disambiguation
    says WE won; remove retry treats 404 as own-delete-applied)."""
    from pipeline_etl_website_visits_spark.operators import ledger
    from pipeline_etl_website_visits_spark.operators.objectstore_http import (
        HttpObjectStoreBackend,
        ObjectStoreHttpServer,
    )

    # raw client: the 503 must surface as the retryable class
    server = ObjectStoreHttpServer(fail_once_per_key=True, fail_mode="before")
    try:
        raw = HttpObjectStoreBackend(server.start())
        with pytest.raises(ledger.TransientStoreError):
            raw.publish("/p/x", b"v1")
        raw.publish("/p/x", b"v1")  # injection consumed: applies
        assert raw.read("/p/x") == b"v1"
    finally:
        server.stop()

    for mode in ("before", "after"):
        server = ObjectStoreHttpServer(fail_once_per_key=True, fail_mode=mode)
        try:
            b = ledger.RetryingBackend(HttpObjectStoreBackend(server.start()))
            b.create_exclusive("/l/lock", b"tok-unique-1")  # absorbed either way
            assert b.read("/l/lock") == b"tok-unique-1"
            b.publish("/l/ptr", b"gen_v1")
            assert b.read("/l/ptr") == b"gen_v1"
            b.touch("/l/lock")
            b.remove("/l/lock")  # 'after': retry sees 404 = own delete applied
            with pytest.raises(FileNotFoundError):
                b.read("/l/lock")
        finally:
            server.stop()


def test_writer_lease_over_http_wire(tmp_path):
    """The engine's writer-lease protocol runs unchanged over the wire
    backend: acquire, heartbeat-refresh, contention timeout, release."""
    from pipeline_etl_website_visits_spark.operators import ledger
    from pipeline_etl_website_visits_spark.operators.objectstore_http import (
        HttpObjectStoreBackend,
        ObjectStoreHttpServer,
    )

    server = ObjectStoreHttpServer()
    prev = ledger.set_commit_backend(HttpObjectStoreBackend(server.start()))
    try:
        art = str(tmp_path / "artifact")
        with ledger.writer_lease(art, name="codes-writer"):
            # a second contender cannot acquire within its timeout
            with pytest.raises(TimeoutError):
                with ledger.writer_lease(art, name="codes-writer", timeout=0.3):
                    pass
        # released: a new holder acquires immediately
        with ledger.writer_lease(art, name="codes-writer", timeout=0.3):
            pass
    finally:
        ledger.set_commit_backend(prev)
        server.stop()


def test_writer_lease_mutual_exclusion_across_processes_over_http(tmp_path):
    """The capability the wire backend adds over the in-process
    object-store profile (whose docstring says 'process-local by
    nature'): TWO OS PROCESSES coordinating through one HTTP store. A
    real subprocess holds the artifact's writer lease; this process must
    time out while it is held and acquire immediately after the holder
    releases — and the holder's critical-section marker must prove the
    two holds never overlapped."""
    import os
    import subprocess
    import sys
    import time as _time

    from pipeline_etl_website_visits_spark.operators import ledger
    from pipeline_etl_website_visits_spark.operators.objectstore_http import (
        HttpObjectStoreBackend,
        ObjectStoreHttpServer,
    )

    server = ObjectStoreHttpServer()
    url = server.start()
    art = str(tmp_path / "artifact")
    acquired = str(tmp_path / "b_acquired")
    release = str(tmp_path / "b_release")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "holder.py"
    script.write_text(
        f"""
import pathlib, sys, time
sys.path.insert(0, {repo_root!r})
from pipeline_etl_website_visits_spark.operators import ledger
from pipeline_etl_website_visits_spark.operators.objectstore_http import HttpObjectStoreBackend

ledger.set_commit_backend(HttpObjectStoreBackend({url!r}))
with ledger.writer_lease({art!r}, name="codes-writer"):
    pathlib.Path({acquired!r}).touch()
    for _ in range(200):
        if pathlib.Path({release!r}).exists():
            break
        time.sleep(0.05)
"""
    )
    proc = subprocess.Popen([sys.executable, str(script)])
    prev = ledger.set_commit_backend(HttpObjectStoreBackend(url))
    try:
        deadline = _time.time() + 20
        while not os.path.exists(acquired):
            assert _time.time() < deadline, "subprocess never acquired"
            assert proc.poll() is None, "subprocess died before acquiring"
            _time.sleep(0.05)
        # held by the OTHER PROCESS through the wire: we must time out
        with pytest.raises(TimeoutError):
            with ledger.writer_lease(art, name="codes-writer", timeout=0.5):
                pass
        open(release, "w").close()
        proc.wait(timeout=20)
        assert proc.returncode == 0
        # released over the wire: acquisition succeeds promptly
        with ledger.writer_lease(art, name="codes-writer", timeout=5.0):
            pass
    finally:
        ledger.set_commit_backend(prev)
        if proc.poll() is None:
            proc.kill()
        server.stop()
