"""Learned document-quality classifier — the trainable twin of the
heuristic quality signals (text.quality_features / repetition_features).

Large-scale corpus pipelines (C4, CCNet, Dolma, RefinedWeb) follow the
same recipe: hand-label or weak-label a small seed set, train a linear
bag-of-words classifier (fastText-style), then score the full corpus and
keep documents above a threshold. This module reproduces that recipe with
Spark's in-box distributed ML primitives (reference has nothing like it —
north-star §0.3 scope, SURVEY §2.11):

* **Features**: the hashing trick (``HashingTF`` over whitespace tokens,
  binary presence bits). The feature space is a FIXED-width vector no
  matter how large the vocabulary grows, so featurization is map-only and
  needs no vocabulary shuffle or dictionary broadcast — the property that
  makes the recipe viable at 100 TB.
* **Training**: ``LogisticRegression`` (LBFGS). Each iteration computes
  partial gradients per partition and tree-aggregates them — map-side
  combine, driver state O(num_features), never O(corpus).
* **Scoring**: the fitted coefficient vector rides into the tasks'
  closure via the model broadcast; scoring the corpus is one MAP-ONLY
  pass (hash + dot product + sigmoid), no join, no shuffle.

Training is the only iterative piece and runs over the (small) labeled
seed set by design; the corpus only ever sees the map-only scoring pass.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _featurize(df: DataFrame, text_col: str, num_features: int):
    """Whitespace-tokenize + hash to a fixed-width binary feature vector.

    Returns the transformed frame with a ``__feat`` vector column. NULL
    text featurizes as the empty document (all-zero vector), matching the
    dedup/text family's null conventions.
    """
    from pyspark.ml.feature import HashingTF

    from pipeline_etl_website_visits_spark.operators.dedup import normalize_text

    # the family's canonical tokenization (lower/trim/collapse-whitespace
    # via normalize_text), so model features can never drift from the
    # heuristic quality signals computed on the same corpus
    toks = df.withColumn(
        "__toks",
        F.split(normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " "),
    )
    tf = HashingTF(
        inputCol="__toks", outputCol="__feat", numFeatures=num_features, binary=True
    )
    return tf.transform(toks)


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 15,
    max_iter: int = 20,
    reg_param: float = 0.01,
):
    """Fit the linear quality model on a labeled seed set.

    ``labeled`` needs ``text_col`` and a 0/1 double ``label_col`` (1 =
    keep-quality). Returns the fitted ``LogisticRegressionModel`` whose
    coefficient vector is O(num_features) on the driver — bounded by
    construction, independent of corpus or vocabulary size.
    """
    from pyspark.ml.classification import LogisticRegression

    feats = _featurize(labeled, text_col, num_features)
    lr = LogisticRegression(
        featuresCol="__feat",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        standardization=False,
    )
    return lr.fit(feats)


def score_quality(
    corpus: DataFrame,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_features: int = 1 << 15,
) -> DataFrame:
    """Score every document: (id, quality_score in [0,1], keep flag).

    One map-only pass — the model's coefficients broadcast with the plan;
    ``num_features`` must match the training call (same hash space).
    """
    from pyspark.ml.functions import vector_to_array

    feats = _featurize(corpus, text_col, num_features)
    scored = model.transform(feats)
    return scored.select(
        F.col(id_col),
        F.round(vector_to_array("probability")[1], 6).alias("quality_score"),
        (F.col("prediction") == 1.0).alias("keep"),
    )
