"""Registry hygiene: the contract every declared query must satisfy."""

import re

from pipeline_etl_website_visits_spark.queries.registry import REGISTRY
import pipeline_etl_website_visits_spark.queries  # noqa: F401


def test_every_query_documents_what_it_certifies():
    for name, spec in REGISTRY.items():
        assert spec.certifies, f"{name} has no certifies note"


def test_oracle_less_queries_are_flagged():
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            assert "no-oracle" in spec.tags or name.startswith("x3"), (
                f"{name} lacks an oracle without being tagged no-oracle"
            )


def test_limit_queries_have_order_by_in_oracle():
    """Deterministic sets: LIMIT must be preceded by ORDER BY in the oracle."""
    for name, spec in REGISTRY.items():
        if spec.oracle and re.search(r"\bLIMIT\b", spec.oracle, re.I):
            assert re.search(r"\bORDER BY\b", spec.oracle, re.I), f"{name}: LIMIT without ORDER BY"


def test_numeric_prefixes_are_unique():
    """Each qNN/xNN prefix names exactly one query (VERDICT r1 finding #2)."""
    seen: dict[str, str] = {}
    for name in REGISTRY:
        prefix = name.split("_", 1)[0]
        assert prefix not in seen, f"prefix {prefix}: {seen[prefix]} vs {name}"
        seen[prefix] = name


def test_driver_order_names_exist_and_cover_round1_gaps():
    """DRIVER_ORDER must only name registered queries, contain no dups, and
    the 50-entry driver prefix must include every query that had no
    CORRECTNESS_r01 row (the driver checks exactly the first 50)."""
    from pipeline_etl_website_visits_spark.queries.registry import DRIVER_ORDER, spark_queries

    assert len(set(DRIVER_ORDER)) == len(DRIVER_ORDER)
    for n in DRIVER_ORDER:
        assert n in REGISTRY, f"DRIVER_ORDER names unknown query {n}"
    ordered = list(spark_queries())
    assert len(ordered) == len(REGISTRY)
    assert set(ordered) == set(REGISTRY)
    assert ordered[: len(DRIVER_ORDER)] == list(DRIVER_ORDER)


def test_no_bare_round_of_division_in_oracles():
    """ROUND( x / y ) of float division is the classic cross-engine trap —
    only integer-arithmetic ratio_round or decimal ROUND are allowed."""
    offenders = []
    for name, spec in REGISTRY.items():
        if not spec.oracle:
            continue
        # flag ROUND( ... / ... ) where the divisor side is not the /1000.0
        # integer-millis form and not a DECIMAL sum
        for m in re.finditer(r"ROUND\(([^()]*/[^()]*)\)", spec.oracle.replace("\n", " ")):
            frag = m.group(1)
            if "// " in frag or "DECIMAL" in frag or "/ 1000.0" in frag or "/ 100.0" in frag:
                continue
            offenders.append((name, frag.strip()[:60]))
    assert not offenders, offenders


def test_scratch_path_fingerprints_source_data(tmp_path):
    """ADVICE r5: the scratch-index tag must change when the source data
    is regenerated — a stale stored index can never be silently reused."""
    from pipeline_etl_website_visits_spark.queries.llmops import _scratch_path

    src = tmp_path / "documents.parquet"
    src.mkdir()
    (src / "part-0.parquet").write_bytes(b"abc")
    p1 = _scratch_path(str(tmp_path), "documents", "gramidx")
    assert p1 == _scratch_path(str(tmp_path), "documents", "gramidx")  # stable
    (src / "part-0.parquet").write_bytes(b"abcd")  # regenerated data
    assert _scratch_path(str(tmp_path), "documents", "gramidx") != p1
    # underscore/success files don't perturb the tag (committers write them)
    (src / "_SUCCESS").write_bytes(b"")
    p3 = _scratch_path(str(tmp_path), "documents", "gramidx")
    assert p3 == _scratch_path(str(tmp_path), "documents", "gramidx")


def test_commit_scratch_build_single_winner(tmp_path):
    """Two concurrent builders race on one atomic rename: first wins,
    the loser's build dir is discarded — no shared build dir, ever."""
    from pipeline_etl_website_visits_spark.queries.llmops import (
        _commit_scratch_build,
    )

    a = tmp_path / "x.build.1"
    b = tmp_path / "x.build.2"
    for d, txt in ((a, "A"), (b, "B")):
        d.mkdir()
        (d / "f").write_text(txt)
    final = str(tmp_path / "x")
    _commit_scratch_build(str(a), final)
    _commit_scratch_build(str(b), final)
    assert (tmp_path / "x" / "f").read_text() == "A"  # winner intact
    assert not a.exists() and not b.exists()  # loser cleaned up


def test_commit_prunes_stale_fingerprint_dirs(tmp_path):
    """A committed build removes the SAME corpus's old-fingerprint dirs
    and hour-old crashed build leftovers, but never a same-fingerprint
    concurrent build dir or another corpus's live index."""
    import os

    from pipeline_etl_website_visits_spark.queries.llmops import (
        _commit_scratch_build,
    )

    dead_pid = 4194311  # > default pid_max — kill(pid, 0) is ESRCH, always
    stale = tmp_path / "spark_graft_k_sf1_oldfp"
    stale.mkdir()
    crashed = tmp_path / f"spark_graft_k_sf1_newfp.build.{dead_pid}"
    crashed.mkdir()
    os.utime(crashed, (0, 0))  # ancient + dead builder — prunable
    other_corpus = tmp_path / "spark_graft_k_sf2_anyfp"
    other_corpus.mkdir()
    racing = tmp_path / f"spark_graft_k_sf1_newfp.build.{dead_pid + 1}"
    racing.mkdir()  # fresh mtime — a live concurrent builder
    slow = tmp_path / f"spark_graft_k_sf1_newfp.build.{os.getpid()}"
    slow.mkdir()
    os.utime(slow, (0, 0))  # ancient mtime but the builder pid is ALIVE
    tmp = tmp_path / "spark_graft_k_sf1_newfp.build.1"
    tmp.mkdir()
    (tmp / "f").write_text("x")
    _commit_scratch_build(str(tmp), str(tmp_path / "spark_graft_k_sf1_newfp"))
    assert (tmp_path / "spark_graft_k_sf1_newfp" / "f").read_text() == "x"
    assert not stale.exists()  # old fingerprint pruned
    assert not crashed.exists()  # ancient crashed build pruned
    assert other_corpus.exists()  # different corpus untouched
    assert racing.exists()  # live same-fingerprint builder untouched
    # ADVICE r13: an hour-old build whose pid is still running is a
    # long-running FIRST-TIME build, not a crash — never rmtree'd mid-write
    assert slow.exists()


def test_gc_scratch_artifacts_sweeps_stale_keeps_live(spark, tmp_path):
    """VERDICT r12 item 6: the standalone retention sweep removes
    stale-fingerprint and undeclared-corpus artifacts, keeps fresh
    concurrent builds, and NEVER touches the live artifact — proven by a
    reader whose DataFrame was resolved BEFORE the sweep still scanning
    clean afterwards."""
    import os

    from pipeline_etl_website_visits_spark.queries.llmops import (
        _corpus_tags,
        gc_scratch_artifacts,
    )

    corpus = tmp_path / "sf"
    src = corpus / "documents.parquet"
    src.mkdir(parents=True)
    (src / "part-0.parquet").write_bytes(b"data")
    sftag, fptag = _corpus_tags(str(corpus), "documents")

    root = tmp_path / "scratch"
    root.mkdir()
    live = root / f"spark_graft_pairovl_{sftag}_{fptag}"
    spark.createDataFrame([(1, 2)], "doc_a long, doc_b long").write.parquet(str(live))
    stale = root / f"spark_graft_pairovl_{sftag}_{'0' * 12}"
    stale.mkdir()
    unknown = root / f"spark_graft_bm25idx_{'f' * 8}_{'e' * 12}"
    unknown.mkdir()
    dead_pid = 4194311  # > default pid_max — kill(pid, 0) is ESRCH, always
    crashed = root / f"spark_graft_pairovl_{sftag}_{fptag}.build.{dead_pid}"
    crashed.mkdir()
    os.utime(crashed, (0, 0))
    racing = root / f"spark_graft_pairovl_{sftag}_{fptag}.build.{dead_pid + 1}"
    racing.mkdir()  # fresh — a live concurrent builder
    slow = root / f"spark_graft_pairovl_{sftag}_{fptag}.build.{os.getpid()}"
    slow.mkdir()
    os.utime(slow, (0, 0))  # ancient mtime, but the builder pid is ALIVE
    not_ours = root / "somebody_elses_dir"
    not_ours.mkdir()

    reader = spark.read.parquet(str(live))  # resolved pre-sweep
    removed = gc_scratch_artifacts([str(corpus)], scratch_root=str(root))

    assert sorted(os.path.basename(p) for p in removed) == sorted(
        [stale.name, unknown.name, crashed.name]
    )
    assert live.exists() and racing.exists() and not_ours.exists()
    # ADVICE r13: an old build dir whose pid still runs is a long-running
    # live build — kept regardless of age (liveness beats the age rule)
    assert slow.exists()
    assert reader.collect()[0]["doc_a"] == 1  # concurrent read survives

    # grace window: a stale dir younger than min_age_s is kept
    stale2 = root / f"spark_graft_pairovl_{sftag}_{'1' * 12}"
    stale2.mkdir()
    assert gc_scratch_artifacts([str(corpus)], scratch_root=str(root), min_age_s=3600) == []
    assert stale2.exists()


def test_commit_scratch_build_reraises_real_failures(tmp_path):
    """A rename that fails while the target does NOT exist is a real
    error (EACCES/EXDEV/...) — it must re-raise, not silently discard
    the build and surface later as a missing-index mystery."""
    import pytest

    from pipeline_etl_website_visits_spark.queries.llmops import (
        _commit_scratch_build,
    )

    with pytest.raises(OSError):
        _commit_scratch_build(str(tmp_path / "never_built"), str(tmp_path / "x"))


def test_coverage_crosswalk_is_current():
    """docs/COVERAGE.md's generated registry-crosswalk block must match
    the live registry (VERDICT r9 item 8: the crosswalk cannot drift —
    regenerate with `python tools/gen_coverage.py` after adding or
    re-tagging queries)."""
    import importlib

    gen = importlib.import_module("tools.gen_coverage")
    with open(gen.DOC) as f:
        doc = f.read()
    assert gen.BEGIN in doc and gen.END in doc
    block = gen.BEGIN + doc.split(gen.BEGIN, 1)[1].split(gen.END, 1)[0] + gen.END
    assert block == gen.render(), (
        "stale crosswalk: run `python tools/gen_coverage.py`"
    )
