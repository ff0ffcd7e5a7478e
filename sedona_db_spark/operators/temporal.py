"""Temporal operators: as-of join (point-in-time lookup).

Not in the reference (SedonaDB is geospatial); part of the pipeline
extension set: joining fact streams to the latest dimension state
(model-version rollouts, label snapshots, price feeds) is the temporal
workhorse of large training-data builds.

Spark-first design: Spark has no ASOF JOIN, and the naive range join
explodes.  The standard scale-out formulation is union + window:
tag both sides, sort (keys, ts, tag) within key partitions, and carry
the latest right payload forward with last(ignorenulls) — ONE shuffle
on the by-keys, fully whole-stage-codegen, no Python.  Ties (equal ts)
match because right rows order before left rows at the same timestamp
(inclusive backward semantics, the DuckDB/pandas `merge_asof` default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import types as T
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    right_on: str | None = None,
    by: list[str] | str | None = None,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "r_",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (direction='backward'; 'forward' takes the
    earliest right row with ``right.ts >= left.ts``), matched within
    ``by`` keys.  Unmatched left rows keep nulls (left-outer).

    ``tolerance`` (seconds, or an interval-compatible number) nulls out
    matches farther than the bound.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    right_on = right_on or on
    if by is None:
        by_cols: list[str] = []
    elif isinstance(by, str):
        by_cols = [by]
    else:
        by_cols = list(by)

    payload = [c for c in right.columns if c not in by_cols and c != right_on]
    renamed = {c: (suffix + c if c in left.columns else c) for c in payload}
    rts_out = suffix + on if on in left.columns else f"{suffix}{right_on}"

    lt = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__tag"),
        F.col(on).alias("__t"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(a)
          for c, a in renamed.items()],
        F.lit(None).cast(right.schema[right_on].dataType).alias(rts_out))
    rt = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by_cols],
        *[F.col(c) for c in by_cols],
        F.lit(0).alias("__tag"),
        F.col(right_on).alias("__t"),
        *[F.col(c).alias(a) for c, a in renamed.items()],
        F.col(right_on).alias(rts_out))
    u = lt.unionByName(rt.select(lt.columns))

    if direction == "backward":
        w = Window.partitionBy(*by_cols).orderBy(F.col("__t").asc(),
                                                 F.col("__tag").asc())
        frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = F.last
    else:
        w = Window.partitionBy(*by_cols).orderBy(F.col("__t").desc(),
                                                 F.col("__tag").asc())
        frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = F.last

    filled = u.select(
        *[c for c in left.columns],
        F.col("__tag"),
        F.col("__t"),
        *[pick(a, ignorenulls=True).over(frame).alias(a)
          for a in list(renamed.values()) + [rts_out]])
    out = filled.filter(F.col("__tag") == 1).drop("__tag")
    if tolerance is not None:
        if isinstance(left.schema[on].dataType,
                      (T.TimestampType, T.TimestampNTZType)):
            gap = F.abs(F.unix_micros(F.col("__t").cast("timestamp"))
                        - F.unix_micros(F.col(rts_out).cast("timestamp"))) / 1e6
        else:  # numeric time axis: tolerance in the same units
            gap = F.abs(F.col("__t") - F.col(rts_out))
        within = F.col(rts_out).isNotNull() & (gap <= float(tolerance))
        for a in list(renamed.values()) + [rts_out]:
            out = out.withColumn(a, F.when(within, F.col(a)))
    return out.drop("__t")
