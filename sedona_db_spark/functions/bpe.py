"""Byte-pair-encoding tokenizer: distributed statistics, broadcast encode.

Classic BPE (Sennrich et al. 2016, the GPT-2 variant of the same scheme):
pre-tokenize text into words, learn merge rules over the *word-frequency
dictionary*, encode by applying the learned merges per word in rank order.
This module keeps the learning algorithm exactly classical but makes the
corpus-side statistics Spark-native.

Scale design (100 TB):

- The corpus never reaches the driver.  Training consumes ONE word-count
  aggregation — ``explode -> groupBy(word).count()`` with map-side partial
  combine collapsing repeated words before the shuffle — followed by a
  bounded ``TakeOrdered`` top-``max_words``.  That top-K word-frequency
  table (<= ``max_words`` rows, the same compressed form every classical
  BPE trainer operates on) is all the driver sees; tail words contribute
  ~nothing to pair statistics, so quality degrades gracefully with the
  cap.  Optionally pre-sample with the deterministic ``hash_sample``.
- The merge loop itself is inherently sequential (merge i+1's statistics
  depend on merge i) — no engine distributes it; running it on the
  compressed dictionary is the standard practice this module mirrors.
- Encoding broadcasts the merge-rank dict (<= ``num_merges`` entries) and
  applies it in an Arrow-batched pandas UDF with a per-batch word cache:
  natural-language batches repeat words heavily, so the merge loop runs
  once per DISTINCT word per batch, not once per token.

Determinism: word extraction is a fixed regex; merge selection breaks
frequency ties by lexicographically smallest pair; encode applies merges
by rank with leftmost-first application — same corpus, same params ->
identical vocabulary on any cluster layout.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType

__all__ = [
    "bpe_train",
    "bpe_encode",
    "bpe_encode_udf",
    "bpe_vocab",
    "encode_word",
]

# runs of lowercase alnum, else single non-space symbols (GPT-ish
# pre-tokenization, lowercased for vocabulary compactness)
_WORD_RE = "[a-z0-9]+|[^a-z0-9\\s]"
_EOW = "</w>"


def _words(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(_WORD_RE), F.lit(0))


def word_frequency_table(df: DataFrame, text_col: str = "text",
                         max_words: int = 100_000) -> list[tuple[str, int]]:
    """Top-``max_words`` (word, count) pairs — the trainer's only view of
    the corpus.  One shuffle (partial-combined word counts) + TakeOrdered;
    ties broken by word so the table is deterministic."""
    counts = (df.select(F.explode(_words(text_col)).alias("w"))
                .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    top = counts.orderBy(F.desc("c"), F.asc("w")).limit(int(max_words))
    return [(r["w"], int(r["c"])) for r in top.collect()]


def _learn_merges(word_counts: list[tuple[str, int]],
                  num_merges: int) -> list[tuple[str, str]]:
    """Classical BPE merge learning over a word-frequency dict.

    Incremental: pair counts are adjusted only for the words a merge
    touched, so the loop is O(num_merges * touched-words), not a full
    recount per iteration; selection is a lazy-deletion heap, not a
    linear scan over all pairs.  Tie-break: highest count, then smallest
    pair.
    """
    import heapq

    words: list[list[str]] = [list(w) + [_EOW] for w, _ in word_counts]
    freqs = [c for _, c in word_counts]

    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    heap: list[tuple[int, tuple[str, str]]] = []

    def _add_word(i: int, sign: int):
        syms = words[i]
        f = freqs[i] * sign
        for a, b in zip(syms, syms[1:]):
            p = (a, b)
            c = pair_counts.get(p, 0) + f
            pair_counts[p] = c
            if c > 0:
                heapq.heappush(heap, (-c, p))
            if sign > 0:
                where.setdefault(p, set()).add(i)

    for i in range(len(words)):
        _add_word(i, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        pair = None
        while heap:
            negc, p = heapq.heappop(heap)
            if pair_counts.get(p, 0) == -negc:   # fresh entry
                pair = p
                break
        if pair is None:
            break
        merges.append(pair)
        joined = pair[0] + pair[1]
        for i in list(where.get(pair, ())):
            syms = words[i]
            if pair[0] not in syms:   # stale index after earlier rewrites
                continue
            _add_word(i, -1)
            out, j = [], 0
            while j < len(syms):
                if (j + 1 < len(syms) and syms[j] == pair[0]
                        and syms[j + 1] == pair[1]):
                    out.append(joined)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            _add_word(i, +1)
        pair_counts[pair] = 0
    return merges


def bpe_train(df: DataFrame, text_col: str = "text",
              num_merges: int = 200, max_words: int = 100_000,
              sample_fraction: float | None = None, seed: int = 0,
              key_col: str = "doc_id") -> list[tuple[str, str]]:
    """Learn BPE merges from a corpus.  Returns the ordered merge list
    (rank = index).  ``sample_fraction`` pre-samples deterministically
    with :func:`operators.batching.hash_sample`."""
    if sample_fraction is not None:
        from sedona_db_spark.operators.batching import hash_sample
        df = hash_sample(df, sample_fraction, key_col=key_col, seed=seed)
    wc = word_frequency_table(df, text_col, max_words)
    return _learn_merges(wc, num_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word, lowest rank first (GPT-2 scheme),
    leftmost-first within a rank pass."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        pair = (syms[best_i], syms[best_i + 1])
        joined = pair[0] + pair[1]
        out, j = [], 0
        while j < len(syms):
            if (j + 1 < len(syms) and syms[j] == pair[0]
                    and syms[j + 1] == pair[1]):
                out.append(joined)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def bpe_vocab(merges: list[tuple[str, str]],
              word_counts: list[tuple[str, int]] | None = None
              ) -> dict[str, int]:
    """token -> id.  Base symbols (sorted characters observed in the
    merge pairs and optional word table, plus the end-of-word marker)
    first, then merge products in rank order."""
    base: set[str] = {_EOW}
    for a, b in merges:
        base.update(ch for ch in a if len(ch) == 1)
        base.update(ch for ch in b if len(ch) == 1)
    if word_counts:
        for w, _ in word_counts:
            base.update(w)
    vocab = {t: i for i, t in enumerate(sorted(base))}
    for a, b in merges:
        t = a + b
        if t not in vocab:
            vocab[t] = len(vocab)
    return vocab


def bpe_encode_udf(merges: list[tuple[str, str]]):
    """Arrow-batched encoder: text -> array<string> of BPE symbols.
    The merge-rank dict rides the UDF closure (broadcast by Spark);
    a per-batch cache runs the merge loop once per distinct word."""
    import re
    ranks = {p: i for i, p in enumerate(merges)}
    rx = re.compile(_WORD_RE)

    def _encode(s: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for text in s:
            if text is None:
                out.append(None)
                continue
            toks: list[str] = []
            for w in rx.findall(text.lower()):
                enc = cache.get(w)
                if enc is None:
                    enc = encode_word(w, ranks)
                    cache[w] = enc
                toks.extend(enc)
            out.append(toks)
        return pd.Series(out)

    return F.pandas_udf(_encode, ArrayType(StringType()))


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               out_col: str = "bpe_tokens") -> DataFrame:
    """Add ``out_col``: the BPE symbol sequence of ``text_col``."""
    return df.withColumn(out_col, bpe_encode_udf(merges)(F.col(text_col)))


def bpe_encode_ids(df: DataFrame, merges: list[tuple[str, str]],
                   vocab: dict[str, int], text_col: str = "text",
                   out_col: str = "bpe_ids") -> DataFrame:
    """Add ``out_col``: token ids under ``vocab`` (unknown symbols -> -1,
    surfacing base-alphabet gaps instead of hiding them)."""
    symbols = bpe_encode_udf(merges)(F.col(text_col))
    vb = {k: int(v) for k, v in vocab.items()}

    def _ids(s: pd.Series) -> pd.Series:
        return pd.Series([None if toks is None else
                          [vb.get(t, -1) for t in toks] for toks in s])

    to_ids = F.pandas_udf(_ids, ArrayType(IntegerType()))
    return df.withColumn(out_col, to_ids(symbols))
