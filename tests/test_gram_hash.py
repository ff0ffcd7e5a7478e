"""Focused tests for the vectorized token-hash n-gram core (r11 —
replaced the gram-STRING-building kernel with a per-token hash +
position-weighted combine; operators/dedup._batch_gram_hashes).

The operators only need hash CONSISTENCY (equal gram <=> equal hash
w.h.p.), never specific values, so the tests pin the consistency
contract against an independent string-built reference, not bit values.
"""
import re

import numpy as np
import pandas as pd

from sedona_db_spark.operators.dedup import (_batch_gram_hashes,
                                             _gram_hash_kernel,
                                             _gram_member_kernel)

_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _ref_gram_strings(texts, n):
    """Independent reference: the n-gram STRINGS per row (the former
    kernel's intermediate), which define gram identity."""
    out = []
    for txt in texts:
        tk = [t for t in _WS.split(txt.lower()) if t] if txt else []
        m = len(tk) - (n - 1)
        out.append([" ".join(tk[i:i + n]) for i in range(max(m, 0))]
                   if m > 0 else [])
    return out


def test_gram_hash_consistent_with_gram_identity():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]  # small vocab -> many repeats
    texts = [" ".join(rng.choice(vocab, size=int(k)))
             for k in rng.integers(0, 30, size=400)]
    texts += ["", None, "   ", "one two", "a\tb\nc d\x0b e\ff\rg h i j"]
    for n in (3, 13):
        s = pd.Series(texts, dtype=object)
        hashes, offs = _batch_gram_hashes(s, n)
        ref = _ref_gram_strings(texts, n)
        # same gram count per row
        counts = [offs[i + 1] - offs[i] for i in range(len(s))]
        assert counts == [len(r) for r in ref]
        # equal gram string <=> equal hash, across the whole batch
        flat_ref = [g for r in ref for g in r]
        assert len(flat_ref) == len(hashes)
        by_gram: dict = {}
        by_hash: dict = {}
        for g, h in zip(flat_ref, hashes.tolist()):
            assert by_gram.setdefault(g, h) == h, "same gram, two hashes"
            assert by_hash.setdefault(h, g) == g, "hash collision in test"


def test_gram_hash_row_boundaries_not_crossed():
    # two rows whose concatenated tokens WOULD form a shared gram if the
    # flat combine leaked across rows
    s = pd.Series(["a b", "c a b c"], dtype=object)
    hashes, offs = _batch_gram_hashes(s, 2)
    assert offs == [0, 1, 4]
    # row 0's single gram "a b" must equal row 1's middle gram "a b"
    row0 = hashes[0:1].tolist()
    row1 = hashes[1:4].tolist()
    assert row0[0] == row1[1]
    assert len(set(row1)) == 3


def test_member_kernel_agrees_with_hash_kernel():
    n = 3
    bench = pd.Series(["alpha beta gamma delta", "x y z"], dtype=object)
    bh, boffs = _batch_gram_hashes(bench, n)
    bset = frozenset(bh.tolist())
    docs = pd.Series(["prefix alpha beta gamma suffix",  # hits
                      "alpha beta delta gamma",          # no shared 3-gram
                      "", None, "x y z"], dtype=object)
    member = _gram_member_kernel(n, bset)(docs)
    assert member.tolist() == [True, False, False, False, True]
    # and the hash kernel enumerates the same hashes the member saw
    ghs = _gram_hash_kernel(n)(docs)
    assert any(h in bset for h in ghs.iloc[0].tolist())
    assert not any(h in bset for h in ghs.iloc[1].tolist())
