"""BPE tokenizer: merge learning pinned against the classic worked
example and an independent naive recount implementation; distributed
statistics pinned against pandas; encode pinned against the per-word
reference."""
from __future__ import annotations

import re

import pandas as pd
import pytest

from sedona_db_spark.functions import bpe as BP


# ------------------------------------------------- naive reference

def _naive_merges(word_counts, num_merges):
    """Full recount every iteration — O(n^2), independent of the
    incremental+heap implementation under test."""
    words = {i: list(w) + ["</w>"] for i, (w, _) in enumerate(word_counts)}
    freqs = {i: c for i, (_, c) in enumerate(word_counts)}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for i, syms in words.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + freqs[i]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] <= 0:
            break
        merges.append(best)
        j = best[0] + best[1]
        for i, syms in words.items():
            out, k = [], 0
            while k < len(syms):
                if (k + 1 < len(syms) and syms[k] == best[0]
                        and syms[k + 1] == best[1]):
                    out.append(j)
                    k += 2
                else:
                    out.append(syms[k])
                    k += 1
            words[i] = out
    return merges


SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_learn_merges_sennrich_example():
    # counts: (e,s) 6+3=9 wins round 1; then (es,t) 9; then (est,</w>) 9;
    # then (l,o) 7; (lo,w) 7; ...
    merges = BP._learn_merges(SENNRICH, 5)
    assert merges[:5] == [("e", "s"), ("es", "t"), ("est", "</w>"),
                          ("l", "o"), ("lo", "w")]


def test_learn_merges_matches_naive_recount():
    corpus = [("banana", 4), ("bandana", 2), ("cabana", 3),
              ("an", 7), ("na", 1), ("a", 9), ("nab", 2)]
    assert BP._learn_merges(corpus, 12) == _naive_merges(corpus, 12)


def test_learn_merges_tiebreak_smallest_pair():
    # ("a","b") and ("c","d") both have count 3 -> smallest pair first
    merges = BP._learn_merges([("ab", 3), ("cd", 3)], 2)
    assert merges[0] == ("a", "b")


def test_encode_word_applies_rank_order():
    merges = BP._learn_merges(SENNRICH, 8)
    ranks = {p: i for i, p in enumerate(merges)}
    assert "".join(BP.encode_word("lowest", ranks)).replace("</w>", "") \
        == "lowest"
    # 'newest' was in-vocab long enough to collapse fully
    enc = BP.encode_word("newest", ranks)
    assert enc[-1].endswith("</w>")
    # unknown word falls back to chars + learned subwords, reconstructs
    enc2 = BP.encode_word("zzlow", ranks)
    assert "".join(enc2).replace("</w>", "") == "zzlow"


def test_word_frequency_table_matches_pandas(spark):
    docs = spark.table("documents")
    got = BP.word_frequency_table(docs, max_words=50)
    pdf = docs.select("text").toPandas()
    rx = re.compile(BP._WORD_RE)
    counts = {}
    for t in pdf["text"]:
        for w in rx.findall(t.lower()):
            counts[w] = counts.get(w, 0) + 1
    ref = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert got == ref


def test_bpe_train_and_encode_roundtrip(spark):
    docs = spark.table("documents")
    merges = BP.bpe_train(docs, num_merges=40, max_words=500)
    assert len(merges) == 40
    out = BP.bpe_encode(docs.limit(20), merges).select(
        "doc_id", "text", "bpe_tokens").toPandas()
    ranks = {p: i for i, p in enumerate(merges)}
    rx = re.compile(BP._WORD_RE)
    for _, r in out.iterrows():
        ref = []
        for w in rx.findall(r["text"].lower()):
            ref.extend(BP.encode_word(w, ranks))
        assert list(r["bpe_tokens"]) == ref
        # reconstruction: concatenating symbols gives back the words
        assert "".join(r["bpe_tokens"]).replace("</w>", "") \
            == "".join(rx.findall(r["text"].lower()))


def test_bpe_train_deterministic_across_partitionings(spark):
    docs = spark.table("documents")
    m1 = BP.bpe_train(docs.repartition(13), num_merges=25, max_words=300)
    m2 = BP.bpe_train(docs.repartition(2), num_merges=25, max_words=300)
    assert m1 == m2


def test_bpe_vocab_and_ids(spark):
    merges = BP._learn_merges(SENNRICH, 5)
    vocab = BP.bpe_vocab(merges)
    assert vocab["</w>"] == 0 or "</w>" in vocab
    # merge products appear after base symbols, in rank order
    ids = [vocab[a + b] for a, b in merges]
    assert ids == sorted(ids)
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["newest lowest"]}))
    out = BP.bpe_encode_ids(docs, merges, vocab).toPandas()
    assert all(i >= -1 for i in out["bpe_ids"][0])


def test_bpe_train_sample_fraction(spark):
    docs = spark.table("documents")
    m = BP.bpe_train(docs, num_merges=10, max_words=200,
                     sample_fraction=0.5, seed=4)
    assert len(m) == 10
