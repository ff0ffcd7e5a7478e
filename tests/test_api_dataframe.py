"""User-facing DataFrame / expression API (sedona_db_spark/api).

Pins the reference's Python-surface contracts
(python/sedonadb/tests/expr/*.py): DataFusion-style Expr display strings,
DataFrame verb semantics (mutate-in-place, USING-join output shapes,
set-op name checks, distinct_on, unnest), and the error taxonomy
(SedonaError with valid-field lists, exact drop/rename messages).  The
full reference expr suite replays through tools/replay_expr_tests.py;
this file keeps the fast engine-side regressions."""

import pandas as pd
import pandas.testing as pdt
import pyarrow as pa
import pytest

from sedona_db_spark.api import (
    DataFrame,
    Expr,
    GroupedDataFrame,
    Literal,
    SedonaError,
    SedonaContext,
    SortExpr,
    col,
    lit,
    sort_expr,
)
from sedona_db_spark.api.functions import AggregateUdf, ScalarUdf


@pytest.fixture(scope="module")
def con(spark):
    return SedonaContext(spark)


def _df(con, data):
    return con.create_data_frame(pd.DataFrame(data))


# ---------------------------------------------------------------- display
def test_expr_display_pins():
    assert repr(col("x")) == "Expr(x)"
    assert repr(col("x", "t")) == "Expr(t.x)"
    assert repr(col("x").alias("a").alias("b")) == "Expr(x AS a AS b)"
    assert repr(col("x").cast(pa.int32())) == "Expr(CAST(x AS Int32))"
    assert repr(col("x").cast(pa.string())) == "Expr(CAST(x AS Utf8))"
    assert repr(col("x").is_null()) == "Expr(x IS NULL)"
    assert repr(col("x").isin([1, 2, 3])) == \
        "Expr(x IN ([Int64(1), Int64(2), Int64(3)]))"
    assert repr(col("x").negate()) == "Expr((- x))"
    assert repr(col("x") + 1) == "Expr(x + Int64(1))"
    assert repr(1 - col("x")) == "Expr(Int64(1) - x)"
    assert repr((col("x") > 0) & (col("y") < 10)) == \
        "Expr(x > Int64(0) AND y < Int64(10))"
    assert repr(~col("x").is_null()) == "Expr(NOT x IS NULL)"
    assert repr(((col("x") + 1) * 2).alias("scaled")) == \
        "Expr((x + Int64(1)) * Int64(2) AS scaled)"
    assert (col("x") + 1)._impl.variant_name() == "BinaryExpr"
    assert col("x")._impl.variant_name() == "Column"
    assert col("x").alias("y")._impl.variant_name() == "Alias"
    assert repr(col("x").asc()) == "SortExpr(x ASC NULLS LAST)"
    assert repr(col("x").desc(nulls_first=True)) == \
        "SortExpr(x DESC NULLS FIRST)"
    assert repr(sort_expr(col("x"), asc=False)) == \
        "SortExpr(x DESC NULLS LAST)"
    assert repr((col("x") + col("y")).desc()) == \
        "SortExpr(x + y DESC NULLS LAST)"


def test_expr_guards():
    with pytest.raises(TypeError):
        {col("x"): 1}
    with pytest.raises(TypeError, match="truth value"):
        bool(col("x") > 0)
    with pytest.raises(TypeError, match="truth value"):
        col("x") and col("y")
    with pytest.raises(TypeError, match="Expr has no length"):
        len(col("x"))
    with pytest.raises(TypeError, match="InternalExpr"):
        Expr("not an internal expr")
    with pytest.raises(TypeError, match="InternalSortExpr"):
        SortExpr("not a sort expr")
    with pytest.raises(TypeError, match="Expr"):
        sort_expr("x")


def test_literal_arrow_protocol():
    assert pa.array(lit(1)) == pa.array([1])
    assert pa.array(lit("one")) == pa.array(["one"])
    assert pa.array(lit(None)) == pa.array([None])
    assert pa.array(lit(pa.array([1]))) == pa.array([1])
    with pytest.raises(ValueError, match="with length != 1"):
        pa.array(lit(pd.Series([])))
    with pytest.raises(ValueError, match=r"with shape != \(1, 1\)"):
        pa.array(lit(pd.DataFrame({"x": [1], "y": [2]})))
    with pytest.raises(ValueError, match="Can't pipe Literal"):
        lit(5.0).funcs


# ---------------------------------------------------------------- funcs
def test_funcs_resolution_and_display(con):
    assert isinstance(con.funcs.st_geomfromwkt, ScalarUdf)
    assert isinstance(con.funcs.st_collect_agg, AggregateUdf)
    assert isinstance(con.funcs.sum, AggregateUdf)
    e = con.funcs.st_geomfromtext("POINT (0 1)")
    assert repr(e) == 'Expr(st_geomfromwkt(Utf8("POINT (0 1)")))'
    assert repr(con.funcs.st_buffer(con.col("geom"), 10.0)) == \
        "Expr(st_buffer(geom, Float64(10)))"
    assert repr(con.col("foofy").funcs.sqrt()) == "Expr(sqrt(foofy))"
    assert repr(con.lit(5.0).funcs.sqrt()) == "Expr(sqrt(Float64(5)))"
    assert repr(con.funcs.geo.as_text(con.col("g"))) == "Expr(st_astext(g))"
    assert repr(con.col("r").rst.band_no_data_value(1)) == \
        "Expr(rs_bandnodatavalue(r, Int64(1)))"
    with pytest.raises(AttributeError, match="Can't find scalar or aggregate"):
        con.funcs.no_such_function_xyz
    with pytest.raises(ValueError, match="Can't pipe Expr"):
        col("x").funcs


def test_funcs_execute_spatial(con):
    out = (_df(con, {"wkt": ["POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"]})
           .mutate(area=con.funcs.st_area(
               con.funcs.st_geomfromwkt(con.col("wkt"))))
           .select("area").to_pandas())
    assert out["area"].tolist() == [1.0]


# ---------------------------------------------------------------- verbs
def test_mutate_semantics(con):
    df = _df(con, {"a": [1, 2], "b": [10, 20]})
    pdt.assert_frame_equal(
        df.mutate(c=df["a"] + df["b"]).to_pandas(),
        pd.DataFrame({"a": [1, 2], "b": [10, 20], "c": [11, 22]}))
    pdt.assert_frame_equal(
        df.mutate(b=df["b"] * 2).to_pandas(),
        pd.DataFrame({"a": [1, 2], "b": [20, 40]}))
    pdt.assert_frame_equal(
        df.mutate(a_copy="a").to_pandas(),
        pd.DataFrame({"a": [1, 2], "b": [10, 20], "a_copy": [1, 2]}))
    pdt.assert_frame_equal(
        df.mutate(k=con.lit(9)).to_pandas(),
        pd.DataFrame({"a": [1, 2], "b": [10, 20], "k": [9, 9]}))
    with pytest.raises(TypeError, match=r"mutate\(\) expects str, Expr"):
        df.mutate(b=123)


def test_select_rename_drop(con):
    df = _df(con, {"x": [1, 2], "y": [10, 20]})
    assert df.select("y", "x").columns == ["y", "x"]
    pdt.assert_frame_equal(
        df.select("x", z=col("y") * 2).to_pandas(),
        pd.DataFrame({"x": [1, 2], "z": [20, 40]}))
    with pytest.raises(SedonaError, match="Valid fields"):
        df.select("nonexistent")
    out = df.rename(c="y")
    assert out.columns == ["x", "c"]
    with pytest.raises(TypeError, match='rename\\(x="a"\\)'):
        df.rename({"a": "x"})
    with pytest.raises(KeyError) as exc:
        df.drop("nope")
    assert exc.value.args[0] == \
        "Column(s) ['nope'] not found. Available columns: ['x', 'y']"
    assert df.drop("x").columns == ["y"]


def test_getitem_getattr(con):
    df = _df(con, {"x": [1], "y": [2]}).alias("foofy")
    assert repr(df["x"]) == "Expr(foofy.x)"
    assert repr(df[1]) == "Expr(foofy.y)"
    assert repr(df[-2]) == "Expr(foofy.x)"
    assert repr(df.x + df.y) == "Expr(foofy.x + foofy.y)"
    with pytest.raises(KeyError, match="not found"):
        df["zzz"]
    with pytest.raises(IndexError, match="out of range"):
        df[2]
    with pytest.raises(TypeError, match="not supported"):
        df[True]
    with pytest.raises(TypeError, match="select"):
        df[["x", "y"]]
    with pytest.raises(TypeError, match="filter"):
        df[col("x") > 0]
    with pytest.raises(AttributeError, match="not found"):
        df.zzz


def test_join_shapes(con):
    left = _df(con, {"k": [1, 2, 3], "v": ["a", "b", "c"]})
    right = _df(con, {"k": [1, 2], "w": ["x", "y"]})
    out = left.join(right, on="k", how="left").sort("k").to_pandas()
    pdt.assert_frame_equal(out, pd.DataFrame(
        {"k": [1, 2, 3], "v": ["a", "b", "c"], "w": ["x", "y", None]}))
    rh = _df(con, {"k": [1, 2, 3], "w": ["x", "y", "z"]})
    lh = _df(con, {"k": [1, 3], "v": ["a", "c"]})
    out = lh.join(rh, on="k", how="right_anti").sort("k").to_pandas()
    pdt.assert_frame_equal(out, pd.DataFrame({"k": [2], "w": ["y"]}))
    rp = _df(con, {"kr": [1, 2, 4], "w": ["x", "y", "z"]})
    out = left.join(rp, on=left.k == rp.kr).sort(left.k).to_pandas()
    assert list(out.columns) == ["k", "v", "kr", "w"]
    assert out["k"].tolist() == [1, 2]
    with pytest.raises(KeyError, match=r"left: \[\].*right: \['k'\]"):
        left.join(_df(con, {"j": [1], "w": ["x"]}), on="k")
    with pytest.raises(ValueError, match="`how` must be one of"):
        left.join(right, on="k", how="cross")
    with pytest.raises(TypeError, match="only str or only Expr"):
        left.join(right, on=["k", left.k == right.k])


def test_set_ops(con):
    a = _df(con, {"x": [1, 1, 2, 3]})
    b = _df(con, {"x": [1, 1, 1, 2]})
    assert a.intersect(b).sort("x").to_pandas()["x"].tolist() == [1, 1, 2]
    assert a.except_distinct(b).to_pandas()["x"].tolist() == [3]
    with pytest.raises(ValueError, match="same column names"):
        a.union(_df(con, {"y": [1]}))


def test_distinct_on(con):
    df = _df(con, {"k": [1, 1, 2, 2], "v": ["a", "a", "b", "b"]})
    pdt.assert_frame_equal(
        df.distinct_on("k").sort("k").to_pandas(),
        pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}))
    assert len(_df(con, {"x": [1, 3, 2, 4]})
               .distinct_on(col("x") > 2).to_pandas()) == 2


def test_agg_group_by(con):
    df = _df(con, {"k": ["a", "a", "b"], "v": [1, 2, 3]})
    out = (df.group_by("k")
           .agg(con.funcs.sum(col("v")).alias("sum_v"),
                n=con.funcs.count(col("v")))
           .sort("k").to_pandas())
    pdt.assert_frame_equal(out, pd.DataFrame(
        {"k": ["a", "b"], "sum_v": [3, 3], "n": [2, 1]}))
    assert isinstance(df.group_by("k"), GroupedDataFrame)
    out = df.agg(total=con.funcs.sum(col("v"))).to_pandas()
    pdt.assert_frame_equal(out, pd.DataFrame({"total": [6]}))
    with pytest.raises(ValueError, match="at least one aggregate"):
        df.agg()
    with pytest.raises(TypeError, match=r"agg\(\) expects Expr"):
        df.agg("v")


def test_agg_spatial_aggregate_routes_through_front_door(con):
    df = _df(con, {"wkt": ["POINT (0 0)", "POINT (1 1)", None]})
    geom = con.funcs.st_geomfromwkt(con.col("wkt"))
    out = (df.mutate(geom=geom).drop("wkt")
           .agg(env=con.funcs.st_envelope_agg(con.col("geom"))))
    txt = (out.mutate(env=con.funcs.st_astext(col("env")))
           .to_pandas()["env"].iloc[0])
    assert txt.startswith("POLYGON")


def test_sql_bracket_array_dialect(con):
    df = con.sql("SELECT 'a' AS label, [10, 20, 30] AS vals")
    out = df.unnest("vals").sort("vals").to_pandas()
    pdt.assert_frame_equal(out, pd.DataFrame(
        {"label": ["a", "a", "a"], "vals": [10, 20, 30]}))
    # subscripts survive the shim
    assert con.sql("SELECT array(1, 2)[0] AS e").to_pandas()["e"][0] == 1


def test_unnest_parallel_and_errors(con):
    df = con.sql("SELECT [1, 2] AS a, [10, 20] AS b")
    pdt.assert_frame_equal(
        df.unnest("a", "b").sort("a").to_pandas(),
        pd.DataFrame({"a": [1, 2], "b": [10, 20]}))
    with pytest.raises(SedonaError, match="No field named"):
        df.unnest("nope")
    with pytest.raises(SedonaError, match="unnest"):
        con.sql("SELECT ST_Point(0.0, 0.0) AS geom").unnest("geom")
    parts = con.sql(
        "SELECT ST_Dump(ST_GeomFromText('MULTIPOINT(0 0, 1 1, 2 2)')) "
        "AS parts")
    assert parts.unnest("parts").count() == 3


def test_sort_null_placement(con):
    df = _df(con, {"x": [3.0, None, 1.0, 2.0]})
    assert df.sort("x").to_pandas()["x"].tolist()[:3] == [1.0, 2.0, 3.0]
    out = df.sort(sort_expr(col("x"), asc=True, nulls_first=True)).to_pandas()
    assert pd.isna(out["x"].iloc[0])


def test_limit_offset_head_len(con):
    df = _df(con, {"x": list(range(10))})
    assert df.limit(3).count() == 3
    assert df.sort("x").limit(3, offset=8).count() == 2
    assert len(df) == 10
    assert df.head(2).count() == 2
    assert isinstance(df.head(2), DataFrame)


def test_arrow_interop_and_views(con):
    df = _df(con, {"x": [1, 2, 3]})
    tbl = df.to_arrow_table()
    assert tbl.num_rows == 3 and tbl.column_names == ["x"]
    assert pa.table(df).num_rows == 3  # __arrow_c_stream__
    df.to_view("api_view_t1", overwrite=True)
    assert con.view("api_view_t1").count() == 3
    con.drop_view("api_view_t1")
    with pytest.raises(SedonaError):
        con.view("api_view_t1").count()


def test_nested_access(con):
    table = pa.table(
        {"arr": [[1, 2, 3], [4, 5, 6]],
         "s": [{"a": 1}, {"a": 3}],
         "m": [[("k", "v1")], [("k", "v2")]]},
        schema=pa.schema({"arr": pa.list_(pa.int64()),
                          "s": pa.struct([pa.field("a", pa.int64())]),
                          "m": pa.map_(pa.string(), pa.string())}))
    t = con.create_data_frame(table)
    assert t.select(e=t.arr[0]).to_pandas()["e"].tolist() == [1, 4]
    assert t.select(a=t.s["a"]).to_pandas()["a"].tolist() == [1, 3]
    assert t.select(v=t.m["k"]).to_pandas()["v"].tolist() == ["v1", "v2"]


def test_literal_from_dataframe(con):
    assert pa.array(lit(con.sql("SELECT 1 AS one"))) == pa.array([1])
    with pytest.raises(ValueError, match="number of columns != 1"):
        pa.array(lit(con.sql("SELECT 1 AS a, 2 AS b")))
    with pytest.raises(ValueError, match="size != 1 row"):
        pa.array(lit(con.sql("SELECT 1 AS one WHERE false")))


def test_filter_rejects_literal_and_str(con):
    df = _df(con, {"x": [1, 2, 3]})
    with pytest.raises(TypeError, match="Literal"):
        df.filter(lit(True))
    with pytest.raises(TypeError, match="Expr"):
        df.filter("x > 0")
    assert isinstance(df.filter(col("x") > 1), DataFrame)
    assert df.filter(col("x") > 1, col("x") < 3).to_pandas()["x"].tolist() \
        == [2]
