"""Generate a row-inflated variant of an sf dir for marginal-cost benchmarks.

Replicates every fact table N times with key remapping (newkey = key*N + rep)
so join fan-out and key distributions match a true larger scale factor;
dims (nation/region) stay fixed. Text/embeddings are perturbed per replica so
near-dup queries see realistic near-duplicates instead of N-way exact clones
(which would blow up pair outputs quadratically).

Usage: python tools/inflate_sf.py [src_dir] [dst_dir] [factor]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def inflate(src, dst, n):
    os.makedirs(dst, exist_ok=True)
    for t in ("region", "nation"):
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"), f"{dst}/{t}.parquet")

    def rep_table(name, key_remaps, per_rep=None):
        # one file per replica under a {name}.parquet directory — the
        # many-file layout real large-scale datasets have, so Spark's
        # file-level parallelism behaves as it would at the target scale
        # (a single <128MB file reads as ONE task regardless of size)
        tab = pq.read_table(f"{src}/{name}.parquet")
        ddir = f"{dst}/{name}.parquet"
        os.makedirs(ddir, exist_ok=True)
        total = 0
        for rep in range(n):
            cols = {}
            for f in tab.schema:
                c = tab.column(f.name)
                if f.name in key_remaps:
                    arr = c.to_numpy(zero_copy_only=False) * n + rep
                    cols[f.name] = pa.array(arr, type=f.type)
                else:
                    cols[f.name] = c
            if per_rep:
                cols = per_rep(cols, rep)
            part = pa.table(cols, schema=pa.schema(
                [pa.field(f.name, f.type) for f in tab.schema]))
            pq.write_table(part, f"{ddir}/part-{rep:03d}.parquet")
            total += part.num_rows
        print(name, total)

    rep_table("customer", {"c_custkey"})
    rep_table("supplier", {"s_suppkey"})
    rep_table("part", {"p_partkey"})
    rep_table("orders", {"o_orderkey", "o_custkey"})
    rep_table("lineitem", {"l_orderkey", "l_partkey", "l_suppkey"})
    rep_table("events", {"event_id", "user_id"})

    def perturb_docs(cols, rep):
        if rep:
            txt = cols["text"].to_pandas()
            txt = txt + f" r{rep}"
            cols["text"] = pa.array(txt, type=pa.string())
            cols["n_chars"] = pa.array(
                cols["n_chars"].to_numpy(zero_copy_only=False) + len(f" r{rep}"),
                type=pa.int64())
        return cols

    rep_table("documents", {"doc_id"}, perturb_docs)

    def perturb_emb(cols, rep):
        if rep:
            lst = cols["embedding"].combine_chunks()
            vals = lst.values.to_numpy(zero_copy_only=False).astype(np.float32)
            rng = np.random.RandomState(rep)
            vals = vals + rng.normal(0, 0.01, size=vals.shape).astype(np.float32)
            cols["embedding"] = pa.ListArray.from_arrays(
                lst.offsets, pa.array(vals, type=pa.float32()))
        return cols

    rep_table("embeddings", {"vec_id"}, perturb_emb)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.bench_sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    inflate(src, dst, n)
