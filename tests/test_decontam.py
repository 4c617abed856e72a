"""Unified decontamination front door (operators/decontam.py, VERDICT r8
item 6): each mode must be BIT-IDENTICAL to its independently-certified
query — the API routes to the same kernels, so any drift is a routing
bug, and these goldens make it loud."""

import pyspark.sql.functions as F
import pytest

from pipeline_etl_website_visits_spark.operators.decontam import decontaminate
from pipeline_etl_website_visits_spark.queries.registry import REGISTRY
import pipeline_etl_website_visits_spark.queries  # noqa: F401 - registry fill
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_fuzzy_mode_matches_x47(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") >= 20)
    evalset = docs.filter(F.col("doc_id") < 20)
    got = decontaminate(corpus, evalset, "fuzzy", n=3)
    want = REGISTRY["x47_decontaminate"].spark(spark, SF_DIR)
    assert _rows(got) == _rows(want) and len(_rows(got)) > 0
    # filter action: clean = corpus minus every reported hit (threshold 1)
    clean = decontaminate(corpus, evalset, "fuzzy", n=3, action="filter")
    hit_ids = {r[0] for r in _rows(got)}
    assert {r["doc_id"] for r in clean.collect()} == (
        {r["doc_id"] for r in corpus.collect()} - hit_ids
    )


def test_membership_mode_matches_x66(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fp = F.md5(F.col("n_chars").cast("string"))
    got = decontaminate(
        docs.select("doc_id", "lang", "n_chars"),
        docs.filter(F.col("source") == "src0"),
        "membership",
        fingerprint=fp,
        action="filter",
    )
    want = REGISTRY["x66_prefilter_decontam"].spark(spark, SF_DIR)
    assert _rows(got) == _rows(want) and len(_rows(got)) > 0
    # report action = exactly the complement (the dropped rows)
    dropped = decontaminate(
        docs.select("doc_id", "lang", "n_chars"),
        docs.filter(F.col("source") == "src0"),
        "membership",
        fingerprint=fp,
        action="report",
    )
    assert {r[0] for r in _rows(dropped)} == (
        {r["doc_id"] for r in docs.collect()} - {r[0] for r in _rows(got)}
    )


def test_semantic_mode_matches_x101(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    evals = emb.filter(F.col("vec_id") % 50 == 0)
    corpus = emb.filter(F.col("vec_id") % 50 != 0)
    got = decontaminate(
        corpus, evals, "semantic", id_col="vec_id", threshold=0.35
    )
    want = REGISTRY["x101_semantic_decontam"].spark(spark, SF_DIR)
    assert _rows(got) == _rows(want) and len(_rows(got)) > 0
    # filter removes exactly the hit corpus ids
    clean = decontaminate(
        corpus, evals, "semantic", id_col="vec_id", threshold=0.35, action="filter"
    )
    assert {r["vec_id"] for r in clean.collect()} == (
        {r["vec_id"] for r in corpus.collect()} - {r[0] for r in _rows(got)}
    )


def test_substring_mode_matches_x138(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    needles = [
        r["needle"]
        for r in docs.filter(F.col("doc_id") % 97 == 0)
        .select("doc_id", F.substring("text", 20, 30).alias("needle"))
        .filter(F.length("needle") == 30)
        .orderBy("doc_id")
        .limit(16)
        .collect()
    ]
    got = decontaminate(docs, docs.limit(0), "substring", needles=needles)
    want = REGISTRY["x138_substring_decontam"].spark(spark, SF_DIR)
    assert _rows(got) == _rows(want) and len(_rows(got)) > 0


def test_substring_default_needles_and_bound(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta"), (3, "the alpha beta gamma doc")],
        "doc_id long, text string",
    )
    evalset = spark.createDataFrame([(10, "Alpha  Beta GAMMA")], "doc_id long, text string")
    # default needles = normalized evalset text: doc 1 and 3 contain it
    hits = decontaminate(docs, evalset, "substring")
    assert {r["doc_id"] for r in hits.collect()} == {1, 3}
    clean = decontaminate(docs, evalset, "substring", action="filter")
    assert {r["doc_id"] for r in clean.collect()} == {2}
    with pytest.raises(ValueError, match="needles"):
        decontaminate(docs, docs, "substring", max_needles=1)


def test_substring_derived_needles_match_case_insensitively(spark):
    """ADVICE r9 (high): derived needles are normalized, so the corpus
    match side must be normalized too — verbatim contamination that
    differs only in case/whitespace must still be caught."""
    docs = spark.createDataFrame(
        [(1, "The Answer Is Paris today"), (2, "unrelated text")],
        "doc_id long, text string",
    )
    evalset = spark.createDataFrame(
        [(10, "The Answer Is Paris")], "doc_id long, text string"
    )
    hits = decontaminate(docs, evalset, "substring")
    assert {r["doc_id"] for r in hits.collect()} == {1}
    clean = decontaminate(docs, evalset, "substring", action="filter")
    got = {(r["doc_id"], r["text"]) for r in clean.collect()}
    # filter returns the ORIGINAL rows (raw text), not the normalized view
    assert got == {(2, "unrelated text")}
    # explicit needles keep the raw-text contract (the x138 shape)
    raw_hits = decontaminate(
        docs, evalset, "substring", needles=["The Answer Is Paris"]
    )
    assert {r["doc_id"] for r in raw_hits.collect()} == {1}
    # review r10 finding: a non-default id_col must work end to end
    # (the filter branch selected a literal 'doc_id' from the hits)
    docs2 = docs.withColumnRenamed("doc_id", "id")
    clean2 = decontaminate(
        docs2, evalset.withColumnRenamed("doc_id", "id"), "substring",
        id_col="id", action="filter",
    )
    assert {r["id"] for r in clean2.collect()} == {2}


def test_mode_and_action_validation(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="mode"):
        decontaminate(docs, docs, "bloom")
    with pytest.raises(ValueError, match="action"):
        decontaminate(docs, docs, "fuzzy", action="drop")
    # ADVICE r9 (low): fuzzy threshold is a gram COUNT, not a cosine float
    with pytest.raises(ValueError, match="shared-gram count"):
        decontaminate(docs, docs, "fuzzy", threshold=0.35, action="filter")


def test_membership_filter_clean_leg_never_joins(spark):
    """The membership mode's scale contract: the prefix-miss leg passes
    through with NO join at all — exactly ONE broadcast anti-join in the
    whole filter plan (the candidates leg), so at 100 TB the provably-
    clean bulk of the corpus is never shuffled or probed."""
    from pipeline_etl_website_visits_spark.plans import simple_plan

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fp = F.md5(F.col("n_chars").cast("string"))
    clean = decontaminate(
        docs.select("doc_id", "lang", "n_chars"),
        docs.filter(F.col("source") == "src0"),
        "membership",
        fingerprint=fp,
        action="filter",
    )
    plan = simple_plan(clean)
    assert plan.count("Join") == 1, plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # no SHUFFLE exchange anywhere (the broadcast build of the tiny eval
    # side is the one allowed Exchange): both legs stay scan-side
    assert "hashpartitioning" not in plan and "SinglePartition" not in plan, plan


def test_curation_pipeline_composes_end_to_end(spark):
    """The workflow the round-9 APIs exist for, through the ONE front
    door (curate.curate_corpus, VERDICT r9 item 5): dedup + decontaminate
    the corpus against an eval set, assign leakage-free splits, schedule
    the train split across epochs, pack it into token bins — each stage
    the same kernel its certified query runs."""
    from pipeline_etl_website_visits_spark.curate import curate_corpus
    from pipeline_etl_website_visits_spark.operators.text import epoch_shuffle

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    evalset = docs.filter(F.col("doc_id") < 20)
    corpus = docs.filter(F.col("doc_id") >= 20)

    out = curate_corpus(
        corpus, evalset, decontam_mode="fuzzy", epochs=2, epoch_buckets=16,
        pack_budget=512,
    )
    hits = {r["doc_id"] for r in decontaminate(corpus, evalset, "fuzzy").collect()}
    clean_ids = {r["doc_id"] for r in out["clean"].collect()}
    assert clean_ids.isdisjoint(hits) and clean_ids
    # clean keeps the corpus schema
    assert out["clean"].columns == corpus.columns

    by_split = {}
    for r in out["splits"].collect():
        by_split.setdefault(r["split"], set()).add(r["doc_id"])
    assert set().union(*by_split.values()) == clean_ids  # a partition of clean

    assert {r["doc_id"] for r in out["train"].collect()} == by_split["train"]
    assert out["train_order"].count() == 2 * len(by_split["train"])
    # bit-identical to calling the stage kernel directly (no drift)
    direct = epoch_shuffle(out["train"], "doc_id", epochs=2, n_buckets=16)
    assert sorted(map(tuple, out["train_order"].collect())) == sorted(
        map(tuple, direct.collect())
    )

    packed_ids = {r["doc_id"] for r in out["packed"].collect()}
    # every non-empty train doc landed in a bin, nothing foreign
    assert packed_ids <= by_split["train"] and packed_ids


def test_curate_corpus_dedup_and_optional_stages(spark):
    """dedup=True keeps the min-id copy of identical texts; evalset=None
    skips decontamination; pack_budget=None omits the packed relation."""
    from pipeline_etl_website_visits_spark.curate import curate_corpus

    docs = spark.createDataFrame(
        [
            (1, "s", "alpha beta gamma"),
            (2, "s", "alpha  BETA gamma"),  # normalized dup of 1
            (3, "s", "delta unique"),
        ],
        "doc_id long, source string, text string",
    )
    out = curate_corpus(docs, None, pack_budget=None)
    assert {r["doc_id"] for r in out["clean"].collect()} == {1, 3}
    assert "packed" not in out
    # dedup off: all rows survive
    out2 = curate_corpus(docs, None, dedup=False, pack_budget=None)
    assert {r["doc_id"] for r in out2["clean"].collect()} == {1, 2, 3}


def test_curate_corpus_quality_gate_stage(spark):
    """quality_keep_per_mille filters per-source by the integer quality
    score via the histogram scale path; bit-identical to calling the
    stage kernel directly."""
    import pyspark.sql.functions as F2

    from pipeline_etl_website_visits_spark.curate import curate_corpus
    from pipeline_etl_website_visits_spark.operators.text import (
        quality_score_millis,
        stratified_top_fraction,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    out = curate_corpus(
        docs, None, dedup=False, quality_keep_per_mille=600, pack_budget=None
    )
    direct = stratified_top_fraction(
        docs, quality_score_millis(F2.col("text")), "source", "doc_id", 600,
        method="histogram",
    )
    assert sorted(r["doc_id"] for r in out["clean"].collect()) == sorted(
        r["doc_id"] for r in direct.collect()
    )
    assert 0 < out["clean"].count() < docs.count()


def test_curate_corpus_dsir_gate(spark):
    """The dsir_target knob keeps each group's top fraction by importance
    score against the target sample — docs resembling the target domain
    survive, clearly off-domain ones go, and the kept set equals the
    direct dsir_scores + stratified cut composition."""
    import pyspark.sql.functions as F

    from pipeline_etl_website_visits_spark.curate import curate_corpus
    from pipeline_etl_website_visits_spark.operators.text import (
        dsir_scores,
        stratified_top_fraction,
    )

    rows = []
    for i in range(8):
        rows.append((i, "srcA", "spark shuffle broadcast join spark shuffle plan"))
    for i in range(8, 16):
        rows.append((i, "srcA", "cats dogs weather lunch cats dogs weather lunch"))
    corpus = spark.createDataFrame(rows, "doc_id long, source string, text string")
    target = spark.createDataFrame(
        [(100, "spark shuffle broadcast join exchange plan")], "doc_id long, text string"
    )

    out = curate_corpus(
        corpus,
        None,
        dedup=False,  # the twin texts above are intentional duplicates
        dsir_target=target,
        dsir_keep_per_mille=500,
        pack_budget=None,
    )
    kept = {r["doc_id"] for r in out["clean"].collect()}
    assert kept == set(range(8))  # the on-domain half survives the 50% cut

    # equivalence with the direct composition
    scores = dsir_scores(corpus, target, "text", "doc_id")
    direct = {
        r["doc_id"]
        for r in stratified_top_fraction(
            corpus.join(scores.select("doc_id", "score_micro"), "doc_id"),
            F.col("score_micro"),
            "source",
            "doc_id",
            500,
            method="window",
        ).collect()
    }
    assert kept == direct


def test_curate_corpus_dsir_gate_passes_short_docs(spark):
    """Docs with <2 tokens carry no bigram evidence: dsir_scores omits
    them, and the domain gate must pass them through unconditionally
    (the streaming twin's documented semantics) — not silently drop them
    even at keep=1000."""
    from pipeline_etl_website_visits_spark.curate import curate_corpus

    rows = [
        (0, "srcA", "spark shuffle broadcast join spark shuffle plan"),
        (1, "srcA", "cats dogs weather lunch cats dogs weather lunch"),
        (2, "srcA", "x"),  # one token: no bigrams
        (3, "srcA", ""),  # empty: no bigrams
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, source string, text string")
    target = spark.createDataFrame(
        [(100, "spark shuffle broadcast join exchange plan")], "doc_id long, text string"
    )

    # keep=1000 keeps every SCORED doc; the unscored short docs must ride
    # through too
    out = curate_corpus(
        corpus, None, dedup=False, dsir_target=target,
        dsir_keep_per_mille=1000, pack_budget=None,
    )
    assert {r["doc_id"] for r in out["clean"].collect()} == {0, 1, 2, 3}

    # at keep=500 the cut applies to the two scored docs only (the
    # off-domain one goes); the short docs still pass
    out2 = curate_corpus(
        corpus, None, dedup=False, dsir_target=target,
        dsir_keep_per_mille=500, pack_budget=None,
    )
    assert {r["doc_id"] for r in out2["clean"].collect()} == {0, 2, 3}


def test_curate_corpus_report_funnel(spark):
    """report=True yields one (stage_ix, stage, n_docs) row per enabled
    stage, each count equal to independently recounting that stage's
    survivors."""
    from pipeline_etl_website_visits_spark.curate import curate_corpus

    rows = [(i, "srcA", f"unique text number {i} alpha beta gamma") for i in range(8)]
    rows += [(100 + i, "srcA", "duplicate text twin alpha beta gamma delta") for i in range(4)]
    corpus = spark.createDataFrame(rows, "doc_id long, source string, text string")
    evalset = spark.createDataFrame(
        [(0, "unique text number 0 alpha beta gamma")], "eid long, text string"
    )
    out = curate_corpus(corpus, evalset, decontam_mode="substring", pack_budget=None, report=True)
    rep = {r["stage"]: (r["stage_ix"], r["n_docs"]) for r in out["report"].collect()}
    assert set(rep) == {"input", "dedup", "decontam"}
    assert rep["input"] == (0, 12)
    assert rep["dedup"][1] == 9  # 8 unique + 1 of the 4 twins
    assert rep["decontam"][1] == out["clean"].count()
    assert rep["dedup"][0] < rep["decontam"][0]
