"""SemDeDup (Abbas et al. 2023): property-pinned against a numpy
replica of the spec on the real embeddings table."""
from __future__ import annotations

import numpy as np
import pandas as pd

from sedona_db_spark.operators.similarity import (ivf_build,
                                                  semantic_dedup,
                                                  semantic_dup_pairs)

THRESHOLD = 0.97
N_LISTS = 6


def _load(spark):
    """The raw table has no near-duplicates (max pairwise cosine 0.48),
    so augment it: every 5th vector gains a slightly-perturbed copy
    (id + 10^6) and every 20th a second copy (id + 2*10^6) — duplicate
    groups of size 2 and 3 with cosine ~0.9995, far above THRESHOLD,
    while unrelated pairs stay below 0.5."""
    base = spark.table("embeddings").toPandas()
    vecs = np.array([np.asarray(v, dtype=np.float64)
                     for v in base["embedding"]])
    rows = list(zip(base["vec_id"].astype(int), vecs))
    rng = np.random.RandomState(17)
    for k, (i, v) in enumerate(list(rows)):
        if k % 5 == 0:
            rows.append((i + 1_000_000,
                         v + 0.02 * rng.standard_normal(v.shape)))
        if k % 20 == 0:
            rows.append((i + 2_000_000,
                         v + 0.02 * rng.standard_normal(v.shape)))
    ids = np.array([r[0] for r in rows])
    vecs = np.array([r[1] for r in rows])
    pdf = pd.DataFrame({"vec_id": ids,
                        "embedding": [list(map(float, v)) for v in vecs],
                        "label": 0})
    df = spark.createDataFrame(pdf)
    return df, ids, vecs


def test_semantic_dup_pairs_match_numpy(spark):
    df, ids, vecs = _load(spark)
    assigned, centroids = ivf_build(df, n_lists=N_LISTS)
    got = semantic_dup_pairs(assigned, THRESHOLD).toPandas()
    lists = assigned.select("vec_id", "__ivf_list").toPandas() \
        .set_index("vec_id")["__ivf_list"].to_dict()
    norms = np.linalg.norm(vecs, axis=1)
    expect = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if lists[ids[i]] != lists[ids[j]]:
                continue
            cos = vecs[i] @ vecs[j] / (norms[i] * norms[j])
            if cos >= THRESHOLD:
                a, b = sorted((int(ids[i]), int(ids[j])))
                expect.add((a, b))
    assert set(zip(got["id_a"], got["id_b"])) == expect


def test_semantic_dedup_properties(spark):
    df, ids, vecs = _load(spark)
    kept = semantic_dedup(df, threshold=THRESHOLD, n_lists=N_LISTS) \
        .toPandas()
    kept_ids = set(kept["vec_id"])
    assigned, centroids = ivf_build(df, n_lists=N_LISTS)
    pairs = semantic_dup_pairs(assigned, THRESHOLD).toPandas()

    # union-find closure of the duplicate graph
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for x in list(parent):
        comps.setdefault(find(x), set()).add(x)

    lists = assigned.select("vec_id", "__ivf_list").toPandas() \
        .set_index("vec_id")["__ivf_list"].to_dict()
    cents = {i: np.asarray(c) for i, c in enumerate(centroids)}
    vec_by_id = {int(i): v for i, v in zip(ids, vecs)}

    def csim(n):
        v, c = vec_by_id[n], cents[lists[n]]
        return v @ c / (np.linalg.norm(v) * np.linalg.norm(c))

    # exactly one survivor per component: the least-centroid-similar
    for comp in comps.values():
        surv = comp & kept_ids
        assert len(surv) == 1, comp
        expect = min(comp, key=lambda n: (csim(n), n))
        assert surv == {expect}
    # every non-component doc survives
    in_comp = set().union(*comps.values()) if comps else set()
    assert kept_ids | in_comp == set(int(i) for i in ids)
    # the test is vacuous unless some duplicates exist at this threshold
    assert comps, "raise THRESHOLD produced no duplicate groups"


def test_semantic_dedup_no_dups_identity(spark):
    pdf = pd.DataFrame({
        "vec_id": [1, 2, 3],
        "embedding": [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.1]]})
    df = spark.createDataFrame(pdf)
    kept = semantic_dedup(df, threshold=0.99, n_lists=2)
    assert kept.count() == 3


def test_semantic_decontaminate_modes(spark):
    import pandas as pd
    corpus = spark.createDataFrame(pd.DataFrame({
        "vec_id": [1, 2, 3],
        "embedding": [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0]]}))
    bench = spark.createDataFrame(pd.DataFrame({
        "embedding": [[1.0, 0.05]]}))
    from sedona_db_spark.operators.similarity import semantic_decontaminate
    kept = semantic_decontaminate(corpus, bench, threshold=0.95).toPandas()
    assert set(kept["vec_id"]) == {3}          # 1 and 2 are near the bench
    flagged = semantic_decontaminate(corpus, bench, threshold=0.95,
                                     mode="flag").toPandas()
    assert dict(zip(flagged["vec_id"], flagged["contaminated"])) == \
        {1: True, 2: True, 3: False}


# ----------------------------------------------------------------------
# round 8: product quantization (Jegou et al. 2011)
# ----------------------------------------------------------------------

def test_pq_exact_when_quantization_lossless(spark):
    """When every subspace has <= 256 distinct values (and the sample
    sees them all), PQ encoding is LOSSLESS and ADC top-k must equal the
    exact L2 top-k bit-for-bit."""
    import numpy as np
    import pandas as pd
    from sedona_db_spark.operators.similarity import (pq_encode, pq_topk,
                                                      pq_train)
    rng = np.random.RandomState(3)
    # 16-dim vectors from a 3-value alphabet: each 4-dim subspace has
    # <= 81 distinct subvectors <= 256, so pq_train adopts the exact
    # unique-subvector codebook and encoding is lossless by construction
    X = rng.choice([0.0, 1.0, 2.0], size=(400, 16))
    pdf = pd.DataFrame({"vec_id": range(400),
                        "embedding": [list(r) for r in X]})
    df = spark.createDataFrame(pdf)
    books = pq_train(df, m=4, seed=11)
    coded = pq_encode(df, books)
    q = list(rng.choice([0.0, 1.0, 2.0], size=16))
    got = pq_topk(coded, books, q, k=10).collect()
    exact = sorted(((np.asarray(v) - np.asarray(q)) ** 2).sum()
                   for v in pdf["embedding"])[:10]
    assert [round(r["adc_dist"], 9) for r in got] == \
        [round(float(e), 9) for e in exact]


def test_pq_recall_on_gaussian_embeddings(spark):
    """Lossy regime: recall@10 of ADC against exact L2 on the real
    embeddings table must clear 0.5 (PQ with m=8 on 64-dim data is a
    coarse 32x compression; this bounds gross breakage, not tuning)."""
    import numpy as np
    from pyspark.sql import functions as F

    from sedona_db_spark.operators.similarity import (pq_encode, pq_topk,
                                                      pq_train)
    emb = spark.table("embeddings").select("vec_id", "embedding") \
        .limit(2000).cache()
    books = pq_train(emb, m=8, seed=5)
    coded = pq_encode(emb, books)
    rows = emb.collect()
    q = list(rows[17]["embedding"])
    got = {r["vec_id"] for r in pq_topk(coded, books, q, k=10).collect()}
    X = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.asarray([r["vec_id"] for r in rows])
    d2 = ((X - np.asarray(q)) ** 2).sum(1)
    want = set(ids[np.argsort(d2)[:10]])
    assert len(got & want) >= 5, (got, want)


def test_pq_train_deterministic_across_partitioning(spark):
    """ADVICE r8: on a corpus LARGER than sample_cap the training sample
    must be a pure function of row values — identical codebooks under
    different partitionings (the old thinning + LIMIT let the plan pick
    the rows)."""
    import numpy as np
    import pandas as pd
    from sedona_db_spark.operators.similarity import pq_train
    rng = np.random.RandomState(9)
    X = rng.normal(size=(3000, 16))
    pdf = pd.DataFrame({"embedding": [list(r) for r in X]})
    df = spark.createDataFrame(pdf)
    b7 = pq_train(df.repartition(7), m=4, seed=2, sample_cap=500)
    b3 = pq_train(df.repartition(3), m=4, seed=2, sample_cap=500)
    assert np.array_equal(b7, b3)
    # and the sample really is capped (codebooks from the full table
    # with a different cap differ — i.e. the cap selected a subset)
    b_all = pq_train(df.repartition(5), m=4, seed=2, sample_cap=3000)
    assert not np.array_equal(b7, b_all)


def test_pq_encode_compression_and_nulls(spark):
    import pandas as pd
    from sedona_db_spark.operators.similarity import pq_encode, pq_train
    pdf = pd.DataFrame({"vec_id": [0, 1, 2],
                        "embedding": [[1.0] * 16, None, [2.0] * 16]})
    df = spark.createDataFrame(pdf)
    books = pq_train(df.where("embedding IS NOT NULL"), m=4, seed=1)
    out = pq_encode(df, books).orderBy("vec_id").collect()
    assert len(out[0]["pq_code"]) == 4          # 16 doubles -> 4 bytes
    assert out[1]["pq_code"] is None


def test_ivf_pq_topk_recall(spark):
    """IVF-PQ composition: coarse list pruning + ADC scoring; with
    nprobe = n_lists (no pruning loss) results equal flat pq_topk, and
    pruned probes keep recall vs the flat path."""
    from sedona_db_spark.operators.similarity import (ivf_build,
                                                      ivf_pq_topk,
                                                      pq_encode, pq_topk,
                                                      pq_train)
    emb = spark.table("embeddings").select("vec_id", "embedding") \
        .limit(1500).cache()
    assigned, cents = ivf_build(emb, n_lists=8, seed=3)
    books = pq_train(emb, m=8, seed=5)
    coded = pq_encode(assigned, books)
    q = list(emb.collect()[42]["embedding"])
    full = [r["vec_id"]
            for r in ivf_pq_topk(coded, cents, books, q, k=10,
                                 nprobe=8).collect()]
    flat = [r["vec_id"] for r in pq_topk(coded, books, q, k=10).collect()]
    assert full == flat
    pruned = {r["vec_id"]
              for r in ivf_pq_topk(coded, cents, books, q, k=10,
                                   nprobe=3).collect()}
    assert len(pruned & set(flat)) >= 6


def test_quantize_int8_roundtrip_and_topk(spark):
    """int8 quantization: codes bounded, scale = max |x|, zero/null
    vectors handled; quantized top-k == exact float top-k on separable
    data (the per-vector scale cancels in the cosine)."""
    import numpy as np

    from sedona_db_spark.operators.similarity import (
        brute_force_topk, quantize_embeddings_int8, quantized_topk)
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(80, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(80)]
    rows.append((80, [0.0] * 16))                 # all-zero vector
    rows.append((81, None))                       # null vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    coded = quantize_embeddings_int8(df)
    got = {r.vec_id: r for r in coded.collect()}
    for i in range(80):
        x = np.asarray(vecs[i], dtype=np.float64)
        assert abs(got[i].q_scale - np.abs(x).max()) < 1e-12
        codes = np.frombuffer(got[i].q_codes, dtype=np.int8)
        assert codes.min() >= -127 and codes.max() <= 127
        expect = np.clip(np.floor(x / np.abs(x).max() * 127.0 + 0.5),
                         -127, 127).astype(np.int8)
        assert (codes == expect).all()
    assert bytes(got[80].q_codes) == bytes(16)    # zero vector -> zero codes
    assert got[80].q_scale == 0.0
    assert got[81].q_codes is None and got[81].q_scale is None
    q = [float(x) for x in rng.normal(size=16)]
    tk = [r.vec_id for r in quantized_topk(coded, q, k=5).collect()]
    exact = [r.vec_id for r in brute_force_topk(df, q, k=5).collect()]
    # int8 keeps order on random gaussian data at this scale
    assert set(tk) & set(exact), "quantized and exact top-5 disjoint"
    assert tk[0] == exact[0]


def test_quantized_topk_dim_mismatch_fails_loud(spark):
    """A codes row whose byte length differs from the query dimension
    must raise with the fix named, never silently drop or mis-score."""
    import pytest as _pytest

    from sedona_db_spark.operators.similarity import quantized_topk
    df = spark.createDataFrame(
        [(1, bytes(8)), (2, bytes(16))],
        "vec_id long, q_codes binary")
    with _pytest.raises(Exception, match="dimensions|quantize"):
        quantized_topk(df, [0.5] * 16, k=1).collect()


def test_quantized_topk_review_guards(spark):
    """Review r11: string ids pass through verbatim (the schema is
    derived, not hardcoded long); NaN embeddings and zero/non-finite
    query vectors fail loud; all-zero codes rows are excluded like the
    oracle's inner-product gate."""
    import numpy as np
    import pytest as _pytest

    from sedona_db_spark.operators.similarity import (
        quantize_embeddings_int8, quantized_topk)
    rows = [(f"id{i}", [float(np.cos(i + j)) for j in range(8)])
            for i in range(20)]
    rows.append(("zzzero", [0.0] * 8))
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    coded = quantize_embeddings_int8(df)
    got = quantized_topk(coded, [1.0] * 8, k=25).collect()
    assert all(isinstance(r.vec_id, str) for r in got)
    assert "zzzero" not in {r.vec_id for r in got}   # excluded, not 0.0
    assert len(got) == 20
    with _pytest.raises(ValueError, match="zero or non-finite"):
        quantized_topk(coded, [0.0] * 8, k=3)
    bad = spark.createDataFrame(
        [(1, [float("nan"), 1.0])], "vec_id long, embedding array<float>")
    with _pytest.raises(Exception, match="NaN/Inf"):
        quantize_embeddings_int8(bad).collect()
