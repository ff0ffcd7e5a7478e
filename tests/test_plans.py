"""Plan-inspection utilities + mechanical scale contracts (§4)."""

import pytest
from pyspark.sql import functions as F

from sedona_db_spark.plans import inspect as pi


def test_pushed_filters_and_pruning(spark):
    df = spark.table("lineitem").filter("l_quantity < 5") \
        .select("l_orderkey", "l_quantity")
    pf = pi.pushed_filters(df)
    assert any("l_quantity" in f for f in pf)
    cols = pi.read_schema_columns(df)
    assert set(cols) <= {"l_orderkey", "l_quantity"}  # column pruning held


def test_python_eval_counting(spark):
    native = spark.table("customer").select("c_custkey")
    assert pi.python_eval_count(native) == 0
    udfy = spark.sql("SELECT ST_Point(1.0, 1.0) AS g FROM customer LIMIT 5")
    assert pi.python_eval_count(udfy) >= 1


def test_shuffle_and_join_strategy(spark):
    agg = spark.table("lineitem").groupBy("l_returnflag").count()
    assert pi.shuffle_count(agg) >= 1
    j = spark.table("lineitem").join(
        F.broadcast(spark.table("nation")),
        F.col("l_suppkey") % 25 == F.col("n_nationkey"))
    assert "BroadcastHashJoin" in pi.join_strategies(j)
    assert pi.broadcast_count(j) >= 1


def test_assert_scales_contract(spark):
    df = spark.table("lineitem").filter("l_quantity < 5") \
        .groupBy("l_returnflag").count()
    pi.assert_scales(df, max_shuffles=2, max_python_evals=0,
                     require_pushed_filter="l_quantity")
    with pytest.raises(AssertionError):
        pi.assert_scales(df, max_shuffles=0)


def test_spatial_filter_reaches_parquet_scan(spark, tmp_path):
    """The §4.2 contract: bbox range rewrite must land in PushedFilters."""
    from sedona_db_spark.sources.geoparquet import (
        read_geoparquet, spatial_filter, write_geoparquet)
    cust = spark.sql("""
      SELECT c_custkey,
             ST_Point(abs(c_acctbal) % 100.0, (c_custkey % 1000) / 10.0) AS geom
      FROM customer LIMIT 2000
    """)
    out = str(tmp_path / "gpq")
    write_geoparquet(cust, out, geom_cols={"geom": "EPSG:4326"})
    back, _ = read_geoparquet(spark, out)
    filt = spatial_filter(back, "geom", 10.0, 10.0, 30.0, 30.0, exact=False)
    pi.assert_scales(filt, max_python_evals=0,
                     require_pushed_filter="bbox.xmin")


def test_brute_force_topk_plan_is_takeordered(spark):
    """Top-k must compile to TakeOrderedAndProject (no full sort/shuffle)."""
    from sedona_db_spark.operators.similarity import brute_force_topk
    emb = spark.table("embeddings")
    qv = [0.1] * len(emb.first()["embedding"])
    plan = pi.executed_plan(brute_force_topk(emb, qv, k=5))
    assert "TakeOrderedAndProject" in plan


def test_spatial_broadcast_join_no_shuffle_of_big_side(spark):
    """Broadcast spatial join: the big side must not hash-exchange."""
    from sedona_db_spark.operators.spatial_join import spatial_join
    cust = spark.sql("""
      SELECT c_custkey, ST_Point(abs(c_acctbal) % 100.0,
             (c_custkey % 1000) / 10.0) AS geom FROM customer""")
    boxes = spark.sql("""
      SELECT n_nationkey, ST_MakeEnvelope(0.0, 0.0, 20.0, 20.0) AS geom
      FROM nation""")
    out = spatial_join(cust, boxes, predicate="within",
                       broadcast_threshold=10**7)
    assert pi.broadcast_count(out) >= 1
    assert pi.shuffle_count(out) == 0  # only the broadcast, no hash exchange


def test_near_dup_band_shuffle_carries_no_vectors(spark):
    """The banded LSH candidate join must ship only (id, band, bh) — the
    embedding vectors (array<double>, ~12 KB/row at 768-dim) stay out of
    the band explode/exchange and are joined back post-dedup."""
    from sedona_db_spark.operators.similarity import (
        _near_dup_candidates, lsh_signature_udf)
    emb = spark.table("embeddings").limit(50)
    dim = len(emb.first()["embedding"])
    sdf = emb.select(F.col("vec_id").alias("id"),
                     F.col("embedding").cast("array<double>").alias("v")) \
             .withColumn("sig", lsh_signature_udf(dim)(F.col("v"))).persist()
    try:
        plan = pi.executed_plan(_near_dup_candidates(sdf, 16, 8))
        banded_lines = [ln for ln in plan.splitlines()
                        if "Generate" in ln or "InMemoryTableScan" in ln
                        or "Exchange" in ln]
        assert banded_lines  # the banded path exists in the plan
        assert all(" v#" not in ln and "(v#" not in ln for ln in banded_lines)
    finally:
        sdf.unpersist()


def test_broadcast_threshold_is_cluster_sane(spark):
    """The 10x-scale regression: at 64 MB AQE converted a 6M-row fact side
    into a driver-built broadcast hash relation (TPC-H Q3 6s stall).
    Pin the threshold at 24 MB so small dims broadcast but fact tables
    never do; explicit F.broadcast() hints still bypass it."""
    v = int(spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    assert v == 24 * 1024 * 1024
