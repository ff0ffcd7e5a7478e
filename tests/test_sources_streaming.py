"""GeoParquet IO, random-geometry generator, streaming operators."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F


def test_geoparquet_roundtrip_and_pruning(spark):
    from sedona_db_spark.sources.geoparquet import (
        read_geoparquet, spatial_filter, write_geoparquet)
    cust = spark.sql(
        "SELECT c_custkey, ST_Point(abs(c_acctbal) % 100.0, (c_custkey % 1000)/10.0) AS geom "
        "FROM customer")
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "gp")
        write_geoparquet(cust.repartition(4), p)
        back, meta = read_geoparquet(spark, p)
        assert back.count() == cust.count()
        assert meta["version"].startswith("1.1")
        assert meta["columns"]["geom"]["encoding"] == "WKB"
        assert back.schema["geom"].metadata["udt"] == "geometry"
        assert "bbox" in back.columns
        # bbox ranges reach the parquet scan as pushed filters
        filt = spatial_filter(back, "geom", 0.0, 0.0, 10.0, 10.0)
        plan = filt._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "bbox.xmin" in plan
        # result matches plain-math filter
        exp = cust.filter(
            "abs(c_acctbal) % 100.0 <= 10.0 AND (c_custkey % 1000)/10.0 <= 10.0").count()
        assert filt.count() == exp


def test_geoparquet_footer_metadata(spark):
    import json
    import pyarrow.parquet as pq
    from sedona_db_spark.sources.geoparquet import write_geoparquet
    cust = spark.sql("SELECT c_custkey, ST_Point(1.0, 2.0) AS geom FROM customer LIMIT 10")
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "gp")
        write_geoparquet(cust, p)
        import glob
        f = glob.glob(os.path.join(p, "*.parquet"))[0]
        md = pq.read_schema(f).metadata
        geo = json.loads(md[b"geo"])
        assert geo["primary_column"] == "geom"
        assert geo["columns"]["geom"]["covering"]["bbox"]["xmin"] == ["bbox", "xmin"]


def test_random_geometry_deterministic(spark):
    from sedona_db_spark.functions.table_functions import sd_random_geometry
    a = sd_random_geometry(spark, {"geom_type": "Point", "num_rows": 500, "seed": 42})
    b = sd_random_geometry(spark, {"geom_type": "Point", "num_rows": 500, "seed": 42}) \
        .repartition(7).withColumnRenamed("geometry", "g2")
    assert a.join(b, "id").filter("geometry != g2").count() == 0
    c = sd_random_geometry(spark, {"geom_type": "Point", "num_rows": 500, "seed": 43}) \
        .withColumnRenamed("geometry", "g2")
    assert a.join(c, "id").filter("geometry != g2").count() > 400


def test_random_geometry_options(spark):
    from sedona_db_spark.functions.table_functions import sd_random_geometry
    df = sd_random_geometry(spark, {
        "geom_type": "Polygon", "num_rows": 300, "num_vertices": [10, 10],
        "size": [1.0, 15.0], "hole_rate": 0.5, "null_rate": 0.1,
        "empty_rate": 0.05, "seed": 42})
    df.createOrReplaceTempView("rg")
    stats = spark.sql("""
      SELECT count(*) AS n, count(geometry) AS nonnull,
             sum(CASE WHEN geometry IS NOT NULL AND ST_IsEmpty(geometry) THEN 1 ELSE 0 END) AS empties,
             sum(CASE WHEN ST_NumInteriorRings(geometry) > 0 THEN 1 ELSE 0 END) AS holes
      FROM rg""").first()
    assert stats["n"] == 300
    assert 240 <= stats["nonnull"] <= 290      # ~10% null
    assert stats["empties"] > 0
    assert stats["holes"] > 50                 # ~50% hole rate
    bounds = spark.sql(
        "SELECT min(ST_XMin(geometry)) AS a, max(ST_XMax(geometry)) AS b FROM rg "
        "WHERE geometry IS NOT NULL AND NOT ST_IsEmpty(geometry)").first()
    assert bounds["a"] >= 0.0 and bounds["b"] <= 100.0


def test_streaming_matches_batch(spark):
    from sedona_db_spark.streaming import ops as so
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "src")
        spark.table("events").limit(1000).write.parquet(src)
        stream = so.event_stream(spark, src, max_files_per_trigger=100)
        res = so.run_batchlike(so.windowed_counts(stream, "1 hour"),
                               os.path.join(td, "ck"))
        batch = (spark.table("events").limit(1000)
                 .groupBy(F.window("ts", "1 hour"), "event_type").count())
        assert res.count() == batch.count()
        sess = so.run_batchlike(so.sessionize(stream, "30 minutes"),
                                os.path.join(td, "ck2"))
        assert sess.count() > 0
        assert set(sess.columns) == {"user_id", "sess_start", "sess_end",
                                     "n_events", "sum_value"}


def test_stateful_running_stats_matches_batch(spark):
    """applyInPandasWithState custom operator == batch groupBy totals."""
    from sedona_db_spark.streaming import ops as so
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "src")
        spark.table("events").limit(2000).write.parquet(src)
        stream = so.event_stream(spark, src, max_files_per_trigger=100)
        out = so.stateful_running_stats(stream)
        name = "st" + os.urandom(4).hex()
        q = (out.writeStream.format("memory").queryName(name)
             .option("checkpointLocation", os.path.join(td, "ck"))
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(120)
        # keep the LAST update per user (running totals are monotone in n)
        res = (spark.table(name)
               .groupBy("user_id")
               .agg(F.max("n_events").alias("n"),
                    F.max("sum_value").alias("s")))
        batch = (spark.table("events").limit(2000).groupBy("user_id")
                 .agg(F.count("*").alias("bn"), F.sum("value").alias("bs")))
        j = res.join(batch, "user_id")
        bad = j.filter("n != bn OR abs(s - bs) > 1e-6").count()
        assert bad == 0 and res.count() == batch.count()


def test_streaming_geofence_matches_batch(spark):
    """Streaming geofence join == batch spatial join on the same data:
    points derived from the event stream tagged with containing zones,
    then windowed per-zone counts."""
    from sedona_db_spark.streaming import ops as so
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "src")
        pts = spark.table("events").limit(500).selectExpr(
            "event_id", "ts", "user_id", "event_type", "value", "props")
        pts.write.parquet(src)
        zones = spark.sql("""
          SELECT n_nationkey AS zone_id,
                 ST_MakeEnvelope(CAST(n_nationkey % 5 AS DOUBLE) * 20.0, 0.0D,
                                 CAST(n_nationkey % 5 AS DOUBLE) * 20.0 + 20.0,
                                 100.0D) AS geom
          FROM nation WHERE n_nationkey < 5""")
        stream = so.event_stream(spark, src, max_files_per_trigger=100) \
            .selectExpr("*", "ST_Point(CAST(user_id % 100 AS DOUBLE), "
                             "CAST(value % 100 AS DOUBLE)) AS geom")
        tagged = so.geofence_join(stream, zones, predicate="within")
        res = so.run_batchlike(tagged, os.path.join(td, "ck"))
        batch = spark.read.parquet(src).selectExpr(
            "*", "ST_Point(CAST(user_id % 100 AS DOUBLE), "
                 "CAST(value % 100 AS DOUBLE)) AS geom")
        from sedona_db_spark.operators.spatial_join import spatial_join
        exp = spatial_join(batch, zones.withColumnRenamed("zone_id", "zid"),
                           predicate="within")
        assert res.count() == exp.count() > 0
        # windowed rollup variant produces per-zone counts
        rolled = so.run_batchlike(
            so.geofence_join(stream, zones, predicate="within",
                             window="6 hours"),
            os.path.join(td, "ck2"))
        assert rolled.count() > 0
        assert {"win_start", "zone_id", "n"} <= set(rolled.columns)
        assert rolled.agg(F.sum("n")).first()[0] == exp.count()


def test_streaming_curation_matches_batch(spark):
    """curate_stream under readStream == the batch quality+decontam
    stages, row for row (both are stateless per-row ops)."""
    import tempfile
    from pyspark.sql import types as T
    from sedona_db_spark.streaming import ops as so
    from sedona_db_spark.functions.text import quality_score_cell
    from sedona_db_spark.operators.dedup import decontaminate

    docs = spark.table("documents").select("doc_id", "text").limit(200)
    bench = spark.createDataFrame(
        [("key agg row scan slow fast table value part hash value table part",)],
        "text string")
    batch = decontaminate(
        docs.filter(F.round(quality_score_cell(F.col("text")), 4) >= 0.85),
        bench, n=13, mode="remove")
    expected = sorted(r.doc_id for r in batch.collect())

    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "src")
        docs.write.parquet(src)
        schema = T.StructType([T.StructField("doc_id", T.LongType()),
                               T.StructField("text", T.StringType())])
        stream = spark.readStream.schema(schema).parquet(src)
        out = so.run_batchlike(so.curate_stream(stream, bench),
                               os.path.join(td, "ck"))
        got = sorted(r.doc_id for r in out.collect())
    assert got == expected and len(expected) > 0


def test_streaming_curation_overcap_benchmark_raises(spark):
    """r8 verdict: the streaming decontam gate must not collect an
    unbounded benchmark gram set — above the cap it raises loud and
    names the batch fallback (a stream cannot take the join plan
    statelessly)."""
    import pytest
    from pyspark.sql import types as T
    from sedona_db_spark.streaming import ops as so

    docs = spark.table("documents").select("doc_id", "text").limit(10)
    bench = spark.table("documents").select("text").limit(50)
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    stream = spark.readStream.schema(schema) \
        .parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(ValueError, match="decontaminate in batch"):
        so.curate_stream(stream, bench, broadcast_threshold=10)
    # the probe stays LIMIT-capped: construction scans at most cap+1
    # gram rows, so an under-cap benchmark still builds the gate
    gated = so.curate_stream(stream, bench.limit(1),
                             broadcast_threshold=500_000)
    assert gated.isStreaming


def test_streaming_batch_assembly_matches_batch(spark):
    """hash_sample / repeat_oversample run under readStream unchanged;
    mix_stream with thresholds from domain_mix_rates == batch
    mix_domains, row for row."""
    import tempfile
    from pyspark.sql import types as T
    from sedona_db_spark.streaming import ops as so
    from sedona_db_spark.operators import batching as B

    docs = spark.table("documents").select("doc_id", "source").limit(300)
    weights = {"src1": 1.0, "src2": 1.0, "src3": 0.5}
    rates = B.domain_mix_rates(docs, weights)
    thresholds = {d: t for d, (t, _r) in rates.items()}

    b_mix = sorted(r.doc_id for r in
                   B.mix_domains(docs, weights, seed=1).collect())
    b_samp = sorted(r.doc_id for r in
                    B.hash_sample(docs, 0.4, seed=3).collect())
    b_over = sorted((r.doc_id, r.epoch) for r in
                    B.repeat_oversample(docs, {"src1": 2.5},
                                        seed=2).collect())

    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "src")
        docs.write.parquet(src)
        schema = T.StructType([T.StructField("doc_id", T.LongType()),
                               T.StructField("source", T.StringType())])
        stream = spark.readStream.schema(schema).parquet(src)
        s_mix = sorted(r.doc_id for r in so.run_batchlike(
            so.mix_stream(stream, thresholds, seed=1),
            os.path.join(td, "c1")).collect())
        s_samp = sorted(r.doc_id for r in so.run_batchlike(
            B.hash_sample(stream, 0.4, seed=3),
            os.path.join(td, "c2")).collect())
        s_over = sorted((r.doc_id, r.epoch) for r in so.run_batchlike(
            B.repeat_oversample(stream, {"src1": 2.5}, seed=2),
            os.path.join(td, "c3")).collect())
    assert s_mix == b_mix and len(b_mix) > 0
    assert s_samp == b_samp and len(b_samp) > 0
    assert s_over == b_over and len(b_over) > 0
