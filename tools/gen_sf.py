"""Organic scale-up generator: true-sf1 / true-sf10 parquet from sf0.1.

Unlike tools/inflate_sf.py (replica inflation: every row appears N times
with remapped keys), this builds ORGANIC larger tables: fresh sequential
key spaces, foreign keys drawn uniformly over the new ranges, per-order
line counts drawn from the empirical lines-per-order distribution, and
every non-key attribute bootstrap-sampled from the sf0.1 empirical
column distribution.  No replica artifacts: group sizes, join fan-outs
and value histograms match a genuinely larger scale factor, which is
what the marginal-cost benchmarks need (a replicated table has exactly
N-fold duplicate groups, which flatters grouping and flatters dedup).

Special cases that keep operator semantics realistic at scale:
- documents.text: each row splices the first half of one sampled base
  text with the second half of another, so near-duplicate cluster sizes
  stay bounded (pure bootstrap would create ~N-fold exact-dup clusters
  and blow up every LSH pair query quadratically).
- embeddings: a sampled base (embedding, label) pair + gaussian noise
  (sigma 0.15, renormalized) keeps the label-cluster geometry without
  creating giant cosine>=0.95 near-dup cliques; 0.2% of rows are planted
  tight duplicates (sigma 0.003) so near-dup queries still find work.

Deterministic (fixed seeds per table/chunk).  Multi-file layout (one
file per ~1M rows) so Spark's file-level parallelism matches how data
arrives at real scale.

Usage: python tools/gen_sf.py [src_sf_dir] [dst_dir] [factor]
  factor 10 -> true-sf1, factor 100 -> true-sf10 (from sf0.1)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CHUNK = 1_000_000


def _bootstrap(col: pa.ChunkedArray, n: int, rng: np.random.RandomState):
    """Sample n values (with replacement) from a base column."""
    base = col.combine_chunks()
    idx = rng.randint(0, len(base), n)
    return base.take(pa.array(idx, type=pa.int64()))


def _write_chunked(dst: str, name: str, total: int, make_chunk) -> None:
    """make_chunk(lo, hi, chunk_index) -> pa.Table; one file per chunk."""
    ddir = os.path.join(dst, f"{name}.parquet")
    os.makedirs(ddir, exist_ok=True)
    ci = 0
    for lo in range(0, total, CHUNK):
        hi = min(lo + CHUNK, total)
        tab = make_chunk(lo, hi, ci)
        # byte-aware row groups (~8 MB, 8k-128k rows): real large-scale
        # parquet carries many row groups per file, and Spark's scan
        # parallelism within a file is bounded by row-group count — 1M-row
        # groups made a 1.5M-row table unsplittable beyond 2 tasks, and
        # fixed 128k rows left wide tables (embeddings: 64 floats/row) at
        # 33 MB groups, capping their scans at 2 tasks
        row_bytes = max(tab.nbytes // max(len(tab), 1), 1)
        rg = int(max(8192, min(131072, (8 << 20) // row_bytes)))
        pq.write_table(tab, os.path.join(ddir, f"part-{ci:04d}.parquet"),
                       row_group_size=rg)
        ci += 1
    print(name, total, f"({ci} files)")


def _simple_table(src: str, dst: str, name: str, key: str, total: int,
                  seed: int, fk_ranges: dict[str, int] | None = None) -> None:
    """Fresh sequential keys + bootstrapped attributes (+ uniform FKs)."""
    tab = pq.read_table(os.path.join(src, f"{name}.parquet"))
    fk_ranges = fk_ranges or {}

    def chunk(lo, hi, ci):
        rng = np.random.RandomState(seed * 1000 + ci)
        n = hi - lo
        cols = {}
        for f in tab.schema:
            if f.name == key:
                cols[f.name] = pa.array(np.arange(lo, hi), type=f.type)
            elif f.name in fk_ranges:
                cols[f.name] = pa.array(
                    rng.randint(0, fk_ranges[f.name], n), type=f.type)
            else:
                cols[f.name] = _bootstrap(tab.column(f.name), n, rng)
        return pa.table(cols, schema=tab.schema)

    _write_chunked(dst, name, total, chunk)


def generate(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in ("region", "nation"):
        pq.write_table(pq.read_table(os.path.join(src, f"{t}.parquet")),
                       os.path.join(dst, f"{t}.parquet"))
        print(t, "copied")

    base_rows = {t: pq.read_metadata(os.path.join(src, f"{t}.parquet")).num_rows
                 for t in ("customer", "supplier", "part", "orders",
                           "lineitem", "events", "documents", "embeddings")}
    n_cust = base_rows["customer"] * factor
    n_supp = base_rows["supplier"] * factor
    n_part = base_rows["part"] * factor
    n_ord = base_rows["orders"] * factor

    _simple_table(src, dst, "customer", "c_custkey", n_cust, 11)
    _simple_table(src, dst, "supplier", "s_suppkey", n_supp, 12)
    _simple_table(src, dst, "part", "p_partkey", n_part, 13)
    _simple_table(src, dst, "orders", "o_orderkey", n_ord, 14,
                  fk_ranges={"o_custkey": n_cust})

    # lineitem: per-order line counts from the empirical distribution
    li = pq.read_table(os.path.join(src, "lineitem.parquet"))
    ok = li.column("l_orderkey").combine_chunks().to_numpy()
    _, base_counts = np.unique(ok, return_counts=True)

    ddir = os.path.join(dst, "lineitem.parquet")
    os.makedirs(ddir, exist_ok=True)
    total_li = 0
    orders_per_chunk = max(CHUNK // int(round(base_counts.mean())), 1)
    ci = 0
    for olo in range(0, n_ord, orders_per_chunk):
        ohi = min(olo + orders_per_chunk, n_ord)
        rng = np.random.RandomState(15_000 + ci)
        counts = base_counts[rng.randint(0, len(base_counts), ohi - olo)]
        n = int(counts.sum())
        okeys = np.repeat(np.arange(olo, ohi), counts)
        starts = np.cumsum(counts) - counts
        linenum = np.arange(n) - np.repeat(starts, counts) + 1
        cols = {}
        for f in li.schema:
            if f.name == "l_orderkey":
                cols[f.name] = pa.array(okeys, type=f.type)
            elif f.name == "l_linenumber":
                cols[f.name] = pa.array(linenum, type=f.type)
            elif f.name == "l_partkey":
                cols[f.name] = pa.array(rng.randint(0, n_part, n), type=f.type)
            elif f.name == "l_suppkey":
                cols[f.name] = pa.array(rng.randint(0, n_supp, n), type=f.type)
            else:
                cols[f.name] = _bootstrap(li.column(f.name), n, rng)
        pq.write_table(pa.table(cols, schema=li.schema),
                       os.path.join(ddir, f"part-{ci:04d}.parquet"))
        total_li += n
        ci += 1
    print("lineitem", total_li, f"({ci} files)")

    # events: fresh event ids, user space scaled with factor
    ev = pq.read_table(os.path.join(src, "events.parquet"))
    max_user = int(ev.column("user_id").combine_chunks().to_numpy().max()) + 1
    _simple_table(src, dst, "events", "event_id",
                  base_rows["events"] * factor, 16,
                  fk_ranges={"user_id": max_user * factor})

    # documents: half-splice composition (bounded near-dup clusters)
    doc = pq.read_table(os.path.join(src, "documents.parquet"))
    texts = doc.column("text").combine_chunks().to_pylist()
    n_doc = base_rows["documents"] * factor

    def doc_chunk(lo, hi, ci):
        rng = np.random.RandomState(17_000 + ci)
        n = hi - lo
        ia = rng.randint(0, len(texts), n)
        ib = rng.randint(0, len(texts), n)
        spliced = []
        for a, b in zip(ia, ib):
            ta, tb = texts[a], texts[b]
            spliced.append(ta[:len(ta) // 2] + tb[len(tb) // 2:])
        cols = {
            "doc_id": pa.array(np.arange(lo, hi), type=pa.int64()),
            "text": pa.array(spliced, type=pa.string()),
            "lang": _bootstrap(doc.column("lang"), n, rng),
            "source": _bootstrap(doc.column("source"), n, rng),
            "n_chars": pa.array([len(s) for s in spliced], type=pa.int64()),
        }
        return pa.table(cols, schema=doc.schema)

    _write_chunked(dst, "documents", n_doc, doc_chunk)

    # embeddings: sampled (vector, label) base + noise, renormalized
    em = pq.read_table(os.path.join(src, "embeddings.parquet"))
    lst = em.column("embedding").combine_chunks()
    dim = len(lst[0])
    base_vecs = lst.values.to_numpy(zero_copy_only=False) \
        .astype(np.float64).reshape(len(em), dim)
    base_labels = em.column("label").combine_chunks().to_numpy()
    n_emb = base_rows["embeddings"] * factor

    def emb_chunk(lo, hi, ci):
        rng = np.random.RandomState(18_000 + ci)
        n = hi - lo
        pick = rng.randint(0, len(base_vecs), n)
        sigma = np.full(n, 0.15)
        sigma[rng.rand(n) < 0.002] = 0.003   # planted tight near-dups
        v = base_vecs[pick] + rng.standard_normal((n, dim)) * sigma[:, None]
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        flat = pa.array(v.astype(np.float32).ravel(), type=pa.float32())
        offs = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
        cols = {
            "vec_id": pa.array(np.arange(lo, hi), type=pa.int64()),
            "embedding": pa.ListArray.from_arrays(offs, flat),
            "label": pa.array(base_labels[pick], type=pa.int32()),
        }
        return pa.table(cols, schema=em.schema)

    _write_chunked(dst, "embeddings", n_emb, emb_chunk)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.bench_true_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    generate(src, dst, factor)
