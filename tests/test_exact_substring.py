"""ExactSubstr dedup (Lee et al. 2022): hand-computed micro cases for
span detection, interval merging, all-occurrence removal and rebuild."""
from __future__ import annotations

import pandas as pd

from sedona_db_spark.operators.dedup import (exact_substring_dedup,
                                             exact_substring_spans)


def _run(spark, rows, n=3, min_count=2):
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = exact_substring_dedup(df, n=n, min_count=min_count).toPandas()
    return out.set_index("doc_id").sort_index()


def test_cross_document_span(spark):
    out = _run(spark, {"doc_id": [1, 2],
                       "text": ["a b c d e", "x a b c y"]})
    # shared 3-gram "a b c": A removes [0,3), B removes [1,4)
    assert out.loc[1, "text"] == "d e"
    assert out.loc[1, "n_removed"] == 3
    assert out.loc[2, "text"] == "x y"
    assert out.loc[2, "n_removed"] == 3


def test_self_repetition_merges_adjacent_spans(spark):
    out = _run(spark, {"doc_id": [1], "text": ["p q r p q r"]})
    # "p q r" occurs twice -> marks [0,3) and [3,6): adjacent spans merge
    # and the whole doc is removed
    assert out.loc[1, "text"] == ""
    assert out.loc[1, "n_removed"] == 6
    assert out.loc[1, "n_tokens"] == 6


def test_overlapping_marks_merge(spark):
    out = _run(spark, {"doc_id": [1, 2],
                       "text": ["u v w x y z", "m u v w x n w x y o"]})
    # dup 3-grams: "u v w", "v w x", "w x y" (each in docs 1 and 2).
    # doc1 marks [0,3),[1,4),[2,5) -> merged [0,5): keeps only "z"
    assert out.loc[1, "text"] == "z"
    assert out.loc[1, "n_removed"] == 5
    # doc2 marks [1,4),[2,5),[6,9) -> merged [1,5) and [6,9)
    assert out.loc[2, "text"] == "m n o"
    assert out.loc[2, "n_removed"] == 7


def test_short_and_unique_docs_untouched(spark):
    out = _run(spark, {"doc_id": [1, 2, 3],
                       "text": ["a b", "q r s t", "unique words only here"]})
    assert out.loc[1, "text"] == "a b"
    assert out.loc[2, "text"] == "q r s t"
    assert (out["n_removed"] == 0).all()


def test_spans_frame_shape(spark):
    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["a b c d e", "x a b c y"]})
    spans = exact_substring_spans(spark.createDataFrame(df), n=3) \
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    assert list(spans.itertuples(index=False, name=None)) == \
        [(1, 0, 3), (2, 1, 4)]


def test_min_count_three(spark):
    rows = {"doc_id": [1, 2, 3],
            "text": ["a b c d", "a b c e", "a b c f"]}
    # pair-level duplicates survive at min_count=3 only if tripled
    out = _run(spark, rows, min_count=3)
    assert out.loc[1, "text"] == "d"
    assert out.loc[2, "text"] == "e"
    assert out.loc[3, "text"] == "f"
    out2 = _run(spark, {"doc_id": [1, 2], "text": ["a b c d", "a b c e"]},
                min_count=3)
    assert (out2["n_removed"] == 0).all()
