"""Width guard for CPU-heavy pandas-UDF stages.

A table that is small ON DISK but heavy IN CPU starves the cluster:
Spark's file-splitting gives a 14 MB / 2-file parquet table ~2-5 input
partitions (one per row group), so every downstream Arrow-batched kernel
stage runs 2-5 tasks while the other cores idle.  At the 100 TB target
the same pathology appears on any small dimension table feeding a heavy
kernel (distance matrices, projections, geodesics).

``widen_if_starved`` repartitions to full parallelism ONLY when both
hold:

- the input's planned partition count is below half the cluster's
  default parallelism (otherwise the scan is already wide enough), and
- the optimizer's size estimate exceeds ``min_bytes`` (otherwise the
  round-robin shuffle + per-task Arrow overhead costs more than the
  idle cores would recover — measured at sf0.1: widening a 150 KB
  table REGRESSED 0.33 s -> 1.4 s, while at sf10 the same widening
  recovers ~4x on the bulk point kernels).

Both checks are plan-time only (no job runs): partition count comes
from the physical plan's RDD handle, the size from Catalyst statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# below this estimated input size, single-digit task counts are cheaper
# than the widening shuffle (a 4 MB point table is ~150k rows — one
# Arrow batch of kernel work)
MIN_WIDEN_BYTES = 4 << 20


def planned_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's sizeInBytes estimate for df's optimized plan (no job)."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return int(str(stats.sizeInBytes()))
    except Exception:
        return None


def widen_if_starved(df: DataFrame, min_bytes: int = MIN_WIDEN_BYTES,
                     min_fraction: float = 0.5) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` when its planned
    partition count is below ``min_fraction`` of it AND the input is big
    enough that the extra shuffle pays for itself.  Identity otherwise.
    """
    try:
        spark = df.sparkSession
        width = spark.sparkContext.defaultParallelism
        nparts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if nparts >= max(int(width * min_fraction), 1):
        return df
    size = planned_size_bytes(df)
    if size is None or size < min_bytes:
        return df
    return df.repartition(width)
