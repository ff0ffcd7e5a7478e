"""Learned quality classifier: the LR model must recover the heuristic
quality gate from raw features, generalize to a held-out hash split,
and score stably across partitionings."""
from __future__ import annotations

from pyspark.sql import functions as F

from sedona_db_spark.functions import quality_model as QM
from sedona_db_spark.functions.text import quality_score_cell
from sedona_db_spark.operators.batching import hash_sample


def _labeled(spark):
    docs = spark.table("documents").select("doc_id", "text")
    return docs.withColumn(
        "label",
        (F.round(quality_score_cell(F.col("text")), 4) >= 0.85)
        .cast("int"))


def test_recovers_heuristic_gate(spark):
    # the gate is a thresholded combination of these same signals -> a
    # linear model over them must fit it well in-sample
    lab = _labeled(spark)
    model = QM.train_quality_classifier(lab, "label")
    scored = QM.score_quality(lab, model)
    acc = (scored
           .withColumn("hit", ((F.col("quality_prob") >= 0.5).cast("int")
                               == F.col("label")).cast("int"))
           .agg(F.avg("hit")).first()[0])
    assert acc >= 0.90, acc


def test_generalizes_to_heldout_hash_split(spark):
    lab = _labeled(spark)
    train = hash_sample(lab, 0.7, seed=13)
    test = lab.join(train.select("doc_id"), "doc_id", "left_anti")
    model = QM.train_quality_classifier(train, "label")
    scored = QM.score_quality(test, model)
    acc = (scored
           .withColumn("hit", ((F.col("quality_prob") >= 0.5).cast("int")
                               == F.col("label")).cast("int"))
           .agg(F.avg("hit")).first()[0])
    assert acc >= 0.85, acc
    assert test.count() > 50


def test_reference_vs_corpus_separates(spark):
    docs = spark.table("documents").select("doc_id", "text")
    lab = _labeled(spark)
    ref = lab.filter("label = 1").select("text")
    model = QM.train_reference_vs_corpus(docs, ref)
    scored = QM.score_quality(lab, model)
    means = (scored.groupBy("label")
             .agg(F.avg("quality_prob").alias("m"))
             .toPandas().set_index("label")["m"])
    assert means[1] > means[0] + 0.1, dict(means)


def test_scoring_stable_across_partitionings(spark):
    lab = _labeled(spark)
    model = QM.train_quality_classifier(lab, "label")
    a = QM.score_quality(lab.repartition(3), model).toPandas()
    b = QM.score_quality(lab.repartition(11), model).toPandas()
    m = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert (abs(m["quality_prob_a"] - m["quality_prob_b"]) < 1e-9).all()
