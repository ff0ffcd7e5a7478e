"""User UDF/UDAF surface (§2.9): geometry_udf, batch_udf, aggregate_udf."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sedona_db_spark.functions import udf as udfmod
from sedona_db_spark.geom import algorithms as alg
from sedona_db_spark.geom.core import Geom


def test_geometry_udf_scalar(spark):
    @udfmod.geometry_udf(returns="double")
    def double_area(g: Geom) -> float:
        return 2.0 * alg.area(g)

    udfmod.register(spark, "DoubleArea", double_area)
    v = spark.sql(
        "SELECT DoubleArea(ST_MakeEnvelope(0.0, 0.0, 3.0, 4.0)) AS v").first()["v"]
    assert v == 24.0


def test_geometry_udf_geom_return(spark):
    @udfmod.geometry_udf(returns="geometry")
    def flip(g: Geom) -> Geom:
        return alg.flip_coordinates(g)

    udfmod.register(spark, "MyFlip", flip)
    wkt = spark.sql(
        "SELECT ST_AsText(MyFlip(ST_Point(1.0, 2.0))) AS v").first()["v"]
    assert wkt == "POINT (2 1)"


def test_geometry_udf_mixed_args(spark):
    @udfmod.geometry_udf(returns="bool")
    def bigger_than(g: Geom, thresh) -> bool:
        return alg.area(g) > float(thresh)

    udfmod.register(spark, "BiggerThan", bigger_than)
    rows = spark.sql("""
      SELECT BiggerThan(ST_MakeEnvelope(0.0,0.0,2.0,2.0), 3.0) AS a,
             BiggerThan(ST_MakeEnvelope(0.0,0.0,1.0,1.0), 3.0) AS b
    """).first()
    assert rows["a"] is True and rows["b"] is False


def test_batch_udf_vectorized(spark):
    @udfmod.batch_udf(returns="double")
    def plus_one(s: pd.Series) -> pd.Series:
        return s + 1.0

    udfmod.register(spark, "PlusOne", plus_one)
    assert spark.sql(
        "SELECT PlusOne(CAST(41.0 AS DOUBLE)) AS v").first()["v"] == 42.0


class SumOfSquares:
    """Reference protocol: __init__/update/state/merge/evaluate."""

    def __init__(self):
        self.total = 0.0

    def update(self, values):
        self.total += float((values.astype(float) ** 2).sum())

    def state(self):
        return self.total

    def merge(self, other_state):
        self.total += other_state

    def evaluate(self):
        return self.total


def test_aggregate_udf_two_phase(spark):
    df = spark.range(100).selectExpr("id % 4 AS g", "CAST(id AS DOUBLE) AS v") \
        .repartition(8)
    out = udfmod.aggregate_udf(df, ["g"], SumOfSquares, ["v"], "ss")
    got = {r["g"]: r["ss"] for r in out.collect()}
    expected = {g: float(sum(i * i for i in range(100) if i % 4 == g))
                for g in range(4)}
    assert got == expected


def test_aggregate_udf_shuffles_states_not_rows(spark):
    """The partial stage must fold rows BEFORE the exchange."""
    df = spark.range(1000).selectExpr("id % 2 AS g", "CAST(id AS DOUBLE) AS v")
    out = udfmod.aggregate_udf(df, ["g"], SumOfSquares, ["v"], "ss")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # mapInPandas (partial) happens below the exchange feeding the final
    assert plan.index("MapInPandas") > plan.index("Exchange") or \
        "MapInPandas" in plan.split("Exchange")[-1]
