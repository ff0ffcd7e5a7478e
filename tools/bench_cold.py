"""Cold-vs-warm decomposition for the pair-set operators (r11 verdict
item #4): with min-of-3 reps plus a full-plan warmup, bench reps 2-3
reuse rep 1's persisted signature frame through the plan-keyed persist
pools, so the committed number partially measures a warm cache.  This
tool reports both:

- warm: reps run back-to-back, pools intact (the bench's protocol);
- cold: PAIR_RESULT_POOL / SIG_FRAME_POOL / the partitioned-KNN pool
  are cleared (frames unpersisted) and the plan-stats memo dropped
  before EACH rep, so every rep rebuilds and re-executes from the parquet
  inputs.  Session-level warmup (JVM codegen, python workers, parquet
  footers) stays warm in both — the decomposition isolates exactly the
  pool effect.

Usage: python tools/bench_cold.py [sf_dir] name [name...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _clear_pools():
    from sedona_db_spark.operators import dedup, knn_join, result_cache
    from sedona_db_spark.operators import spatial_join as sj
    result_cache.PAIR_RESULT_POOL.clear()
    result_cache.SIG_FRAME_POOL.clear()
    knn_join._PARTITIONED_POOL.clear()
    with sj._STATS_MEMO_LOCK:
        sj._STATS_MEMO.clear()


def main():
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    import __spark_entry__ as entry
    from sedona_db_spark import get_spark
    spark = get_spark("bench_cold")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    entry._prep(spark, sf_dir)
    spark.sql("SELECT ST_AsText(ST_Point(1.0, 1.0))").collect()
    for name in args:
        fn = qs[name]
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        for label, cold in (("warm", False), ("cold", True)):
            best = None
            for _ in range(3):
                if cold:
                    _clear_pools()
                t0 = time.time()
                fn(spark, sf_dir).write.mode("overwrite") \
                    .format("noop").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            print(f"{name} {label}: min-of-3 {best:6.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
