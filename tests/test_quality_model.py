"""Learned quality classifier (operators/quality_model.py): the
fastText-style seed-train / corpus-score recipe on pyspark.ml.

No registry query (training is iterative and float-order dependent — no
SQL twin); certified here by planted-signal recovery, null conventions,
and the map-only scoring plan shape.
"""

import random

import pyspark.sql.functions as F

from pipeline_etl_website_visits_spark.operators import quality_model as QM

GOOD = ["insight", "analysis", "method", "result", "careful", "study", "evidence", "clear"]
BAD = ["spam", "click", "buy", "free", "winner", "cash", "offer", "now"]


def _doc(rng, vocab, n=30):
    return " ".join(rng.choice(vocab) for _ in range(n))


def _seed_frames(spark):
    rng = random.Random(7)
    train = [(i, _doc(rng, GOOD), 1.0) for i in range(60)] + [
        (100 + i, _doc(rng, BAD), 0.0) for i in range(60)
    ]
    test = [(1000 + i, _doc(rng, GOOD), 1.0) for i in range(40)] + [
        (2000 + i, _doc(rng, BAD), 0.0) for i in range(40)
    ]
    tr = spark.createDataFrame(train, "doc_id long, text string, label double")
    te = spark.createDataFrame(test, "doc_id long, text string, label double")
    return tr, te


def test_classifier_recovers_planted_separation(spark):
    tr, te = _seed_frames(spark)
    model = QM.train_quality_classifier(tr)
    out = QM.score_quality(te, model).join(te.select("doc_id", "label"), "doc_id")
    rows = out.collect()
    assert len(rows) == 80
    acc = sum(
        1
        for r in rows
        if (r["keep"] and r["label"] == 1.0) or (not r["keep"] and r["label"] == 0.0)
    ) / len(rows)
    assert acc >= 0.95
    # scores are calibrated to the right half for the clear-cut docs
    good = [r["quality_score"] for r in rows if r["label"] == 1.0]
    bad = [r["quality_score"] for r in rows if r["label"] == 0.0]
    assert min(good) > max(bad)


def test_mixed_documents_score_between_the_classes(spark):
    rng = random.Random(11)
    tr, _ = _seed_frames(spark)
    model = QM.train_quality_classifier(tr)
    mixed = " ".join(
        [_doc(rng, GOOD, 15), _doc(rng, BAD, 15)]
    )
    df = spark.createDataFrame(
        [(1, _doc(rng, GOOD)), (2, mixed), (3, _doc(rng, BAD))],
        "doc_id long, text string",
    )
    s = {r["doc_id"]: r["quality_score"] for r in QM.score_quality(df, model).collect()}
    assert s[1] > s[2] > s[3]


def test_null_and_empty_text_score_as_empty_doc(spark):
    tr, _ = _seed_frames(spark)
    model = QM.train_quality_classifier(tr)
    df = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in QM.score_quality(df, model).collect()}
    # both featurize to (nearly) empty vectors -> identical scores, no crash
    assert rows[1]["quality_score"] == rows[2]["quality_score"]


def test_scoring_pass_is_map_only(spark):
    """The corpus side must never shuffle: featurize + model.transform is
    a single map-side pipeline (the coefficients travel with the plan)."""
    tr, te = _seed_frames(spark)
    model = QM.train_quality_classifier(tr)
    plan = QM.score_quality(te, model)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
