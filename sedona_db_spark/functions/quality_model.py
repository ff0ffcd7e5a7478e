"""Learned quality classifier over native text features.

Production curation pipelines (CCNet, GPT-3, LLaMA) filter with a LEARNED
quality model — a linear classifier scoring "does this look like the
high-quality reference corpus" — rather than hand thresholds alone.  This
module supplies that step Spark-first:

- Features are the engine's existing NATIVE text signals
  (functions/text.py: token/char counts, word length, punctuation/digit/
  stopword ratios, Gopher repetition signals) — zero Python in the
  feature plan; the only Python is inside pyspark.ml's own iterations.
- Training is pyspark.ml LogisticRegression: distributed L-BFGS whose
  per-iteration cost is one treeAggregate over the feature frame —
  the standard scalable formulation (no driver-side data).
- Scoring is a broadcast of the coefficient vector: one narrow pass.

Labeling follows the reference-corpus recipe: label 1 = sample of a
trusted corpus, 0 = general crawl; ``train_reference_vs_corpus`` wires
exactly that, and any boolean column works for custom setups.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "quality_features",
    "FEATURE_NAMES",
    "train_quality_classifier",
    "train_reference_vs_corpus",
    "score_quality",
]

FEATURE_NAMES = [
    "log_tokens", "log_chars", "avg_word_len", "punct_ratio",
    "digit_ratio", "stopword_ratio", "dup_token_ratio",
    "top_bigram_ratio",
]


def quality_features(text: Column) -> list[Column]:
    """The native feature expressions, in FEATURE_NAMES order."""
    from sedona_db_spark.functions import text as tx
    nt = tx.token_count(text).cast("double")
    nc = tx.char_count(text).cast("double")
    return [
        F.log1p(nt),
        F.log1p(nc),
        F.coalesce(tx.avg_word_len(text).cast("double"), F.lit(0.0)),
        tx.punct_ratio(text).cast("double"),
        tx.digit_ratio(text).cast("double"),
        tx.stopword_ratio(text).cast("double"),
        F.coalesce(tx.dup_token_ratio(text).cast("double"), F.lit(0.0)),
        F.coalesce(tx.top_bigram_ratio(text).cast("double"), F.lit(0.0)),
    ]


def _with_features(df: DataFrame, text_col: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector
    feats = quality_features(F.col(text_col))
    return df.withColumn(
        "__features", array_to_vector(F.array(*feats)))


def train_quality_classifier(df: DataFrame, label_col: str,
                             text_col: str = "text",
                             max_iter: int = 60,
                             reg_param: float = 1e-4):
    """Fit the LR quality model.  Returns the fitted pyspark.ml model;
    every iteration is one distributed gradient aggregate."""
    from pyspark.ml.classification import LogisticRegression
    feat = _with_features(df, text_col).withColumn(
        "__label", F.col(label_col).cast("double"))
    lr = LogisticRegression(maxIter=max_iter, regParam=reg_param,
                            featuresCol="__features", labelCol="__label",
                            probabilityCol="__prob",
                            rawPredictionCol="__raw",
                            predictionCol="__pred")
    return lr.fit(feat)


def train_reference_vs_corpus(corpus: DataFrame, reference: DataFrame,
                              text_col: str = "text",
                              max_iter: int = 60,
                              reg_param: float = 1e-4):
    """The CCNet-style setup: label 1 = reference corpus, 0 = general
    corpus; class sizes are whatever the caller sampled them to."""
    lab = (reference.select(F.col(text_col)).withColumn("__y", F.lit(1))
           .unionByName(
               corpus.select(F.col(text_col)).withColumn("__y", F.lit(0))))
    return train_quality_classifier(lab, "__y", text_col,
                                    max_iter, reg_param)


def score_quality(df: DataFrame, model, text_col: str = "text",
                  out_col: str = "quality_prob") -> DataFrame:
    """Add ``out_col``: P(high quality).  One narrow pass; the
    coefficient vector rides the broadcast plan."""
    from pyspark.ml.functions import vector_to_array
    scored = model.transform(_with_features(df, text_col))
    return (scored
            .withColumn(out_col,
                        vector_to_array(F.col("__prob")).getItem(1))
            .drop("__features", "__prob", "__raw", "__pred"))
