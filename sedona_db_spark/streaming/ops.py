"""Structured Streaming operators (north-star extension).

The reference is batch-only (SURVEY.md: "no streaming surface anywhere");
our operators are DataFrame-native, so the streaming variants come almost
free: the same expressions run under `readStream` with watermarks.

Provided:
- event_stream: file-source stream over an events-shaped directory
- windowed_counts: tumbling/sliding window agg with watermark
- sessionize: session windows (built-in session_window)
- streaming_dedup: dropDuplicatesWithinWatermark on a fingerprint
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def event_stream(spark: SparkSession, directory: str,
                 max_files_per_trigger: int = 1) -> DataFrame:
    return (spark.readStream
            .schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(directory))


def windowed_counts(stream: DataFrame, window: str = "1 hour",
                    slide: str | None = None,
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling (or sliding) window counts per event_type with late-data
    handling.  At scale: partial aggregation + state store keyed by
    (window, event_type); watermark bounds state size."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (stream.withWatermark("ts", watermark)
            .groupBy(w.alias("win"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    "event_type", "n", "sum_value"))


def sessionize(stream: DataFrame, gap: str = "30 minutes",
               watermark: str = "2 hours") -> DataFrame:
    """Session windows per user (built-in session_window operator)."""
    return (stream.withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
            .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
            .select("user_id", F.col("sess.start").alias("sess_start"),
                    F.col("sess.end").alias("sess_end"), "n_events", "sum_value"))


def streaming_dedup(stream: DataFrame, cols: list[str],
                    watermark: str = "1 hour") -> DataFrame:
    """Exact streaming dedup bounded by watermark state."""
    return stream.withWatermark("ts", watermark) \
                 .dropDuplicatesWithinWatermark(cols)


def stateful_running_stats(stream: DataFrame,
                           watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (count, sum, max) maintained in the state store.

    This is the pattern the reference cannot express (batch-only engine);
    at scale the state store shards by user across executors, each batch
    updates only touched keys, and the watermark bounds replay."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("m", T.DoubleType()),
    ])

    def update(key, pdfs, state):
        n, s, m = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            if len(pdf):
                m = max(m, float(pdf["value"].max()))
        state.update((n, s, m))
        yield pd.DataFrame([{"user_id": key[0], "n_events": n,
                             "sum_value": s, "max_value": m}])

    return (stream.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def run_batchlike(stream_df: DataFrame, tmp_dir: str) -> DataFrame:
    """Drain a (bounded) stream to completion into a memory table and
    return the result as a batch DataFrame — test/verify helper."""
    import uuid
    name = "t" + uuid.uuid4().hex[:8]
    q = (stream_df.writeStream.format("memory")
         .queryName(name)
         .option("checkpointLocation", tmp_dir)
         .outputMode("complete" if _has_agg(stream_df) else "append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    return stream_df.sparkSession.table(name)


def _has_agg(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().logical().toString()
    return "Aggregate" in plan


def geofence_join(stream: DataFrame, zones: DataFrame,
                  stream_geom: str = "geom", zone_geom: str = "geom",
                  predicate: str = "within",
                  window: str | None = None,
                  watermark: str = "2 hours") -> DataFrame:
    """Streaming geofence: tag each streamed point with the static zone
    containing it (stream-static broadcast join), optionally rolled up
    into windowed per-zone counts.

    Scale design: the static zone side is broadcast once (zones are
    small by nature); the join condition is a NATIVE bbox range check so
    Catalyst keeps it in the broadcast hash/nested-loop stage, and the
    exact predicate runs as an Arrow-batched refine filter after the
    join — the streaming micro-batch plan is the same shape as the
    batch broadcast spatial join.  The reference has no streaming
    surface (SURVEY: batch-only); this is the north-star extension."""
    from sedona_db_spark.functions import get_udf
    from sedona_db_spark.operators.spatial_join import _PREDICATES, bbox_col
    if predicate not in _PREDICATES:
        raise ValueError(f"unsupported predicate {predicate!r}")
    stx = get_udf("ST_X")
    sty = get_udf("ST_Y")
    s = stream.withColumn("__px", stx(F.col(stream_geom))) \
              .withColumn("__py", sty(F.col(stream_geom)))
    zcols = {c: (f"zone_{c}" if c in stream.columns else c)
             for c in zones.columns}
    z = zones.select([F.col(c).alias(a) for c, a in zcols.items()])
    z = z.withColumn("__zb", bbox_col(F.col(zcols[zone_geom])))
    cond = ((F.col("__px") >= F.col("__zb.xmin")) &
            (F.col("__px") <= F.col("__zb.xmax")) &
            (F.col("__py") >= F.col("__zb.ymin")) &
            (F.col("__py") <= F.col("__zb.ymax")))
    from sedona_db_spark.operators.spatial_join import _refine_udf
    joined = s.join(F.broadcast(z), cond, "inner")
    refine = _refine_udf(predicate, False)
    joined = joined.filter(
        refine(F.col(stream_geom), F.col(zcols[zone_geom])))
    joined = joined.drop("__px", "__py", "__zb")
    if window is None:
        return joined
    return (joined.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("win"),
                     *[a for c, a in zcols.items() if c != zone_geom])
            .agg(F.count("*").alias("n"))
            .select(F.col("win.start").alias("win_start"),
                    *[a for c, a in zcols.items() if c != zone_geom], "n"))


def curate_stream(stream: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", min_quality: float = 0.85,
                  n: int = 13, bench_text_col: str | None = None,
                  broadcast_threshold: int = 500_000) -> DataFrame:
    """Streaming curation: quality gate + benchmark decontamination.

    Both stages are STATELESS per-row ops (the quality score is the
    flat-batch Arrow kernel, bit-equal to the native cell spec;
    contamination is a membership kernel
    over the collected benchmark gram-hash set), so the pipeline runs
    under ``readStream`` with no state store and no watermark — each
    micro-batch is curated independently, exactly matching the batch
    operators' row-level semantics.  The benchmark side is a STATIC
    DataFrame, hashed once at plan time."""
    from sedona_db_spark.functions.text import quality_score_fast
    from sedona_db_spark.operators.dedup import (_gram_hash_kernel,
                                                 _gram_member_kernel)
    btc = bench_text_col or text_col
    gh = F.pandas_udf(_gram_hash_kernel(n), "array<long>")
    # LIMIT-capped collect, matching batch `decontaminate`: the cap
    # bounds driver memory.  The batch operator degrades to an equi-join
    # above the cap; a stream CANNOT (the membership must be a stateless
    # per-row expression — a stream-static join over exploded grams
    # re-shapes the output), so an oversized benchmark raises loud and
    # names the batch fallback instead of OOMing the driver.
    cap = max(int(broadcast_threshold), 1)
    bench_rows = (benchmark
                  .select(F.explode(gh(F.col(btc))).alias("__g"))
                  .distinct().limit(cap + 1).collect())
    if len(bench_rows) > cap:
        raise ValueError(
            f"curate_stream: benchmark has > {cap} distinct {n}-gram "
            "hashes — too large to broadcast to a stateless stream "
            "filter. Raise broadcast_threshold if the driver has "
            "headroom, or decontaminate in batch "
            "(operators.dedup.decontaminate), which falls back to a "
            "hash equi-join plan at any benchmark size.")
    bset = frozenset(r["__g"] for r in bench_rows)
    member = F.pandas_udf(_gram_member_kernel(n, bset), "boolean")
    return (stream
            .filter(F.round(quality_score_fast(F.col(text_col)), 4)
                    >= min_quality)
            .filter(~member(F.col(text_col))))


def mix_stream(stream: DataFrame, thresholds: dict[str, int],
               domain_col: str = "source", key_col: str = "doc_id",
               seed: int = 1) -> DataFrame:
    """Streaming domain mixing with PRECOMPUTED keep thresholds.

    The batch ``mix_domains`` derives thresholds from a corpus count —
    unavailable midstream — so the streaming form takes them explicitly
    (from ``domain_mix_rates`` on a profile batch, the production
    pattern: rates are a deployment artifact, per-row keep is pure).
    The keep rule is the same deterministic LCG filter: stateless, no
    watermark, batch == stream row for row.  ``hash_sample`` and
    ``repeat_oversample`` (operators/batching.py) are already stateless
    column expressions and run under readStream unchanged.
    """
    from sedona_db_spark.operators.batching import lcg_hash
    h = lcg_hash(key_col, seed)
    thr = None
    for d, t in sorted(thresholds.items()):
        cond = F.col(domain_col) == F.lit(d)
        thr = (F.when(cond, F.lit(int(t))) if thr is None
               else thr.when(cond, F.lit(int(t))))
    if thr is None:
        return stream.where(F.lit(False))
    return stream.where(h < thr.otherwise(F.lit(0)))
