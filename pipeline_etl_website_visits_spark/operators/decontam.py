"""Unified benchmark-decontamination API over the four leakage modes.

The engine grew four independently-certified decontamination kernels —
n-gram overlap (x47), approximate-membership prefilter + exact anti-join
(x66), embedding-space similarity (x101), and exact-substring containment
(x138). Each has its own oracle-matched query; this module is the
USER-FACING front door (VERDICT r8 item 6): one
:func:`decontaminate` call routes to the shared kernels, so a pipeline
author writes ``decontaminate(corpus, evalset, mode="fuzzy")`` instead of
learning four operator modules — and the goldens prove each mode's output
is bit-identical to its certified query, because the call IS the same
kernel (no re-implementation to drift).

Mode cheat-sheet (all distributed-first — the eval side is always the
small side, broadcast or driver-bounded; the corpus side never shuffles
before its hits are isolated):

============  ======================================  ==========================
mode          catches                                  kernel
============  ======================================  ==========================
fuzzy         shared word n-grams (reformat-robust)    dedup.contamination_hits
membership    exact fingerprint matches at scan speed  16-bit prefix IN-set +
              (no false negatives; FPs exact-verified)  broadcast anti-join
semantic      meaning-level leakage (paraphrases)      similarity.semantic_decontam_hits
substring     verbatim answer strings                  text.substring_decontam_hits
============  ======================================  ==========================

Two actions: ``action="report"`` returns the mode's native hit relation
(audit trail — schemas differ per mode, documented on each branch);
``action="filter"`` returns the CLEAN corpus rows (corpus schema
preserved) — the "give me the decontaminated corpus" semantics every
mode supports.

Scale notes: fuzzy/substring/semantic are map-only against a broadcast
eval structure until the final hit aggregation; membership splits the
scan into provably-clean rows (prefix miss — never shuffled, never
joined) and candidates (exact broadcast anti-join). The eval set being
small is a CONTRACT (benchmarks are KBs against TB corpora); the
membership prefix collect is bounded at 65536 entries by construction
and the substring needle list is driver-bounded by ``max_needles``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_MODES = ("fuzzy", "membership", "semantic", "substring")


def decontaminate(
    corpus: DataFrame,
    evalset: DataFrame,
    mode: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    n: int = 3,
    threshold: float | None = None,
    fingerprint: Column | None = None,
    needles: "list[str] | None" = None,
    max_needles: int = 64,
    action: str = "report",
) -> DataFrame:
    """Decontaminate ``corpus`` against ``evalset`` (see module doc).

    Parameters routed per mode — ``n``/``text_col`` (fuzzy), the
    fingerprint Column (membership; default ``md5(normalize_text)``),
    ``vec_col``/``threshold`` (semantic; default 0.35), and
    ``needles``/``max_needles`` (substring; default needles = the
    evalset's normalized text, bounded).

    ``action="report"`` schemas: fuzzy → (doc_id, shared_grams);
    membership → the dropped corpus rows; semantic →
    (corpus_id, eval_id, sim); substring → (doc_id, n_hits).
    ``action="filter"`` always returns clean corpus rows, corpus schema.
    """
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    if action not in ("report", "filter"):
        raise ValueError(f"action must be 'report' or 'filter', got {action!r}")

    if mode == "fuzzy":
        from pipeline_etl_website_visits_spark.operators.dedup import (
            contamination_hits,
        )

        hits = contamination_hits(corpus, evalset, text_col, id_col, n=n)
        if action == "report":
            return hits
        if threshold is not None and threshold < 1:
            # in this mode `threshold` is a shared-GRAM COUNT (>=1), not the
            # cosine float semantic mode takes — int() would silently turn
            # 0.35 into "keep everything" (min_shared=0)
            raise ValueError(
                f"fuzzy-mode threshold is a shared-gram count >= 1, got "
                f"{threshold!r} (cosine thresholds belong to mode='semantic')"
            )
        min_shared = 1 if threshold is None else int(threshold)
        dropped = hits.filter(F.col("shared_grams") >= min_shared).select(
            F.col("doc_id").alias(id_col)
        )
        return corpus.join(F.broadcast(dropped), id_col, "left_anti")

    if mode == "membership":
        return _membership(corpus, evalset, text_col, id_col, fingerprint, action)

    if mode == "semantic":
        from pipeline_etl_website_visits_spark.operators.similarity import (
            semantic_decontam_hits,
        )

        hits = semantic_decontam_hits(
            corpus,
            evalset,
            vec_col=vec_col,
            id_col=id_col,
            threshold=0.35 if threshold is None else threshold,
        )
        if action == "report":
            return hits
        dropped = hits.select(F.col("corpus_id").alias(id_col))
        return corpus.join(F.broadcast(dropped), id_col, "left_anti")

    # substring
    from pipeline_etl_website_visits_spark.operators.dedup import normalize_text
    from pipeline_etl_website_visits_spark.operators.text import (
        substring_decontam_hits,
    )

    derived = needles is None
    if derived:
        rows = (
            evalset.select(normalize_text(F.col(text_col)).alias("needle"))
            .filter(F.length("needle") > 0)
            .distinct()
            .limit(max_needles + 1)
            .collect()
        )
        if len(rows) > max_needles:
            raise ValueError(
                f"substring decontamination derived >{max_needles} needles from "
                f"the evalset; pass an explicit bounded `needles` list or raise "
                f"max_needles (driver-literal contract — the needle array ships "
                f"in the plan to every task)"
            )
        needles = sorted(r["needle"] for r in rows)
    # derived needles are NORMALIZED (lowercase, collapsed whitespace), so
    # they must match a normalized view of the corpus too — otherwise
    # verbatim contamination with any uppercase or double space is a silent
    # false negative.  Explicit caller needles keep the raw-text contract
    # (x138's shape).  Only (id, normalized text) feed the hit scan; the
    # filter anti-join below still returns ORIGINAL corpus rows.
    match_side = corpus
    if derived:
        match_side = corpus.select(
            F.col(id_col), normalize_text(F.col(text_col)).alias(text_col)
        )
    hits = substring_decontam_hits(match_side, needles, text_col=text_col, id_col=id_col)
    if action == "report":
        return hits
    # the hits relation's id column is named id_col (both engines) — a
    # literal "doc_id" here crashed every non-default id_col caller
    dropped = hits.select(F.col(id_col))
    return corpus.join(F.broadcast(dropped), id_col, "left_anti")


def _membership(
    corpus: DataFrame,
    evalset: DataFrame,
    text_col: str,
    id_col: str,
    fingerprint: Column | None,
    action: str,
) -> DataFrame:
    """Approximate-membership prefilter + exact verify (the x66 shape,
    lifted verbatim): the 16-bit fingerprint-prefix set over the eval
    side (≤65536 entries — a literal IN-set Catalyst compiles to a hash
    probe; no false negatives, like a Bloom filter) splits the corpus AT
    THE SCAN into provably-clean rows (prefix absent: pass through,
    never shuffled or joined) and candidates (prefix present: EXACT
    broadcast anti-join, so a false positive cannot drop a good doc).
    The union equals the plain anti-join — the x66 oracle's exact check.
    """
    if fingerprint is None:
        from pipeline_etl_website_visits_spark.operators.dedup import normalize_text

        fingerprint = F.md5(normalize_text(F.col(text_col)))
    cols = corpus.columns
    tagged = corpus.select(*cols, fingerprint.alias("__fp"))
    contam = evalset.select(fingerprint.alias("__fp"))
    # driver-side sketch, hard-bounded: distinct() BEFORE the collect caps
    # the driver pull at 65536 rows by construction even if a caller
    # points ``evalset`` at something corpus-sized (the x66 query skips
    # the distinct because its eval side is certified tiny; a public API
    # cannot assume that)
    prefixes = sorted(
        r[0] for r in contam.select(F.substring("__fp", 1, 4)).distinct().collect()
    )
    pref = F.substring(F.col("__fp"), 1, 4)
    provably_clean = tagged.filter(~pref.isin(prefixes))
    candidates = tagged.filter(pref.isin(prefixes))
    verified_clean = candidates.join(F.broadcast(contam), "__fp", "left_anti")
    if action == "filter":
        return provably_clean.unionByName(verified_clean).select(*cols)
    # report = the dropped rows: candidates whose fingerprint exact-matches
    return candidates.join(F.broadcast(contam), "__fp", "left_semi").select(*cols)
