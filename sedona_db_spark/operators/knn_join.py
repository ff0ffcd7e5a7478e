"""KNN join: for each query row, the k nearest object rows.

Reference semantics (/root/reference/rust/sedona-query-planner/src/
spatial_predicate.rs:254-297 KNNPredicate; docs/reference/sql-joins.md:60-80):
planar distance, optional tie inclusion, query-side filters may be pushed
below the KNN, object-side filters must be applied AFTER the join.

Spark design:
- broadcast path (objects fit in a broadcast): objects collected once,
  a numpy uniform-grid index is built PER EXECUTOR BATCH inside
  `mapInPandas` (index rebuilt per partition, never shipped — same rule
  the reference applies to its per-partition R-trees).
- large-large path: grid-cell candidate join with expanding ring search,
  then exact top-k by window — one shuffle per ring round (2 rounds
  typical).  v1 ships the broadcast path; the ring path arrives with the
  partitioned join generalization.

Tie-breaking: ties beyond k are dropped deterministically by object id
unless include_ties=True (reference `knn_include_tie_breakers`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sedona_db_spark.functions.kernels import _decode, _fast_points
from sedona_db_spark.geom import algorithms as alg
from sedona_db_spark.geom import core


class _GridIndex:
    """Uniform-grid point index with expanding-ring KNN (numpy)."""

    def __init__(self, pts: np.ndarray, ids: np.ndarray, target_per_cell: int = 8):
        self.pts = pts
        self.ids = ids
        n = len(pts)
        self.x0, self.y0 = pts[:, 0].min(), pts[:, 1].min()
        x1, y1 = pts[:, 0].max(), pts[:, 1].max()
        ncells = max(n // target_per_cell, 1)
        self.nx = max(int(np.sqrt(ncells)), 1)
        self.ny = self.nx
        self.w = max((x1 - self.x0) / self.nx, 1e-9)
        self.h = max((y1 - self.y0) / self.ny, 1e-9)
        cx = np.clip(((pts[:, 0] - self.x0) / self.w).astype(int), 0, self.nx - 1)
        cy = np.clip(((pts[:, 1] - self.y0) / self.h).astype(int), 0, self.ny - 1)
        cell = cx * self.ny + cy
        order = np.argsort(cell, kind="stable")
        self.sorted_cell = cell[order]
        self.order = order
        self.starts = np.searchsorted(self.sorted_cell, np.arange(self.nx * self.ny))
        self.ends = np.searchsorted(self.sorted_cell, np.arange(self.nx * self.ny), side="right")

    def _cell_members(self, cx, cy):
        if cx < 0 or cy < 0 or cx >= self.nx or cy >= self.ny:
            return None
        c = cx * self.ny + cy
        s, e = self.starts[c], self.ends[c]
        if s == e:
            return None
        return self.order[s:e]

    def _ring_members(self, qcx, qcy, ring):
        members = []
        if ring == 0:
            m = self._cell_members(qcx, qcy)
            if m is not None:
                members.append(m)
            return members
        for cx in range(qcx - ring, qcx + ring + 1):
            for cy in (qcy - ring, qcy + ring):
                m = self._cell_members(cx, cy)
                if m is not None:
                    members.append(m)
        for cy in range(qcy - ring + 1, qcy + ring):
            for cx in (qcx - ring, qcx + ring):
                m = self._cell_members(cx, cy)
                if m is not None:
                    members.append(m)
        return members

    def knn(self, q: np.ndarray, k: int):
        """(ids, dists) of k nearest objects to q.  Expands rings until the
        minimum possible distance of the next ring exceeds the kth best —
        exact, not approximate."""
        qcx = int(np.clip((q[0] - self.x0) / self.w, 0, self.nx - 1))
        qcy = int(np.clip((q[1] - self.y0) / self.h, 0, self.ny - 1))
        min_cell = min(self.w, self.h)
        got: list[np.ndarray] = []
        count = 0
        ring = 0
        max_ring = max(self.nx, self.ny)
        kth_best = np.inf
        while ring <= max_ring:
            members = self._ring_members(qcx, qcy, ring)
            if members:
                got.extend(members)
                count += sum(len(m) for m in members)
            if count >= k:
                idx = np.concatenate(got)
                d = np.hypot(self.pts[idx, 0] - q[0], self.pts[idx, 1] - q[1])
                kth_best = np.partition(d, k - 1)[k - 1] if len(d) >= k else np.inf
                # any point in ring r+1 is at least r*min_cell away from q's cell
                if ring * min_cell > kth_best:
                    break
            ring += 1
        if not got:
            idx = np.arange(len(self.pts))
        else:
            idx = np.concatenate(got)
        d = np.hypot(self.pts[idx, 0] - q[0], self.pts[idx, 1] - q[1])
        k_eff = min(k, len(idx))
        sel = np.argpartition(d, k_eff - 1)[:k_eff] if len(idx) > k_eff else np.arange(len(idx))
        # deterministic tie-break: distance, then object id
        sel = sel[np.lexsort((self.ids[idx[sel]], d[sel]))]
        return self.ids[idx[sel]], d[sel]


def knn_join(
    queries: DataFrame,
    objects: DataFrame,
    k: int,
    query_geom: str = "geom",
    object_geom: str = "geom",
    include_ties: bool = False,
) -> DataFrame:
    """Broadcast KNN join.  Output: query columns + object id/geom columns +
    ``knn_distance``, k rows per query (deterministic tie order).
    """
    spark = queries.sparkSession
    # object side must be materialized driver-side once (broadcast path);
    # non-point objects fall back to bbox-center representative + refine
    obj_rows = objects.collect()
    obj_cols = [c for c in objects.columns]
    gi = obj_cols.index(object_geom)
    pts = []
    geoms = []
    for r in obj_rows:
        b = r[gi]
        g = core.from_wkb(bytes(b)) if b is not None else None
        geoms.append(g)
        if g is None or g.is_empty():
            pts.append((np.nan, np.nan))
        else:
            bb = alg.bounds(g)
            pts.append(((bb[0] + bb[2]) / 2.0, (bb[1] + bb[3]) / 2.0))
    obj_pts = np.asarray(pts, dtype=np.float64)
    valid = ~np.isnan(obj_pts[:, 0])
    obj_idx = np.arange(len(obj_rows))[valid]
    index_pts = obj_pts[valid]
    exact_needed = any(g is not None and g.gt != core.POINT for g in geoms)

    bc = spark.sparkContext.broadcast({
        "pts": index_pts, "ids": obj_idx,
        "rows": [tuple(r) for r in obj_rows],
        "geom_wkb": [None if g is None else core.to_wkb(g) for g in geoms],
        "exact": exact_needed,
    })

    out_schema = T.StructType(
        list(queries.schema.fields)
        + [T.StructField(f"o_{f.name}" if f.name in queries.columns else f.name, f.dataType)
           for f in objects.schema.fields]
        + [T.StructField("knn_distance", T.DoubleType())])
    obj_out_names = [f"o_{c}" if c in queries.columns else c for c in obj_cols]
    qcols = list(queries.columns)
    qg_idx = qcols.index(query_geom)

    def run(iterator):
        data = bc.value
        idx = _GridIndex(data["pts"], data["ids"]) if len(data["pts"]) else None
        obj_geoms = None
        for pdf in iterator:
            if idx is None:
                yield pd.DataFrame(columns=[f.name for f in out_schema.fields])
                continue
            out_rows = []
            wkbs = pdf[query_geom]
            qpts = _fast_points(wkbs)
            decoded = None if qpts is not None else _decode(wkbs)
            # candidate multiplier when exact refinement is needed;
            # include_ties ranks ALL broadcast objects (exact tie cut —
            # the broadcast path's object side is small by construction)
            n_obj = len(data["ids"])
            if include_ties:
                kk = n_obj
            elif data["exact"]:
                kk = min(max(k * 4, k + 8), n_obj)
            else:
                kk = k
            for i in range(len(pdf)):
                if qpts is not None:
                    q = qpts[i]
                    qgeom = None
                else:
                    qgeom = decoded[i]
                    if qgeom is None or qgeom.is_empty():
                        continue
                    bb = alg.bounds(qgeom)
                    q = np.array([(bb[0] + bb[2]) / 2.0, (bb[1] + bb[3]) / 2.0])
                ids, dists = idx.knn(q, kk)
                if data["exact"]:
                    if obj_geoms is None:
                        obj_geoms = [None if w is None else core.from_wkb(w)
                                     for w in data["geom_wkb"]]
                    if qgeom is None:
                        qgeom = core.Geom(core.POINT, np.asarray(q))
                    exact = [(oid, alg.distance(qgeom, obj_geoms[oid]) or 0.0)
                             for oid in ids]
                    exact.sort(key=lambda t: (t[1], t[0]))
                    ranked = exact
                else:
                    ranked = list(zip(ids, dists))
                if include_ties and len(ranked) > k:
                    # reference DISTANCE_TOLERANCE (spatial_index.rs:28-60)
                    kth = ranked[k - 1][1]
                    pairs = [p for p in ranked if p[1] <= kth + 1e-9]
                else:
                    pairs = ranked[:k]
                qrow = tuple(pdf.iloc[i])
                for oid, dd in pairs:
                    out_rows.append(qrow + data["rows"][oid] + (float(dd),))
            yield pd.DataFrame(out_rows, columns=[f.name for f in out_schema.fields])

    return queries.mapInPandas(run, schema=out_schema)
