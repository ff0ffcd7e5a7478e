"""User-facing Python DataFrame / expression API.

Mirrors the reference's Python surface (python/sedonadb/python/sedonadb:
context.py, dataframe.py, expr/expression.py, expr/literal.py,
functions/__init__.py) re-expressed over PySpark: expressions are a small
Python IR that renders DataFusion-style display strings and compiles to
native Spark Columns (or ANSI SQL for the aggregate path, which reuses the
engine's SQL front door and its ST_*_Agg rewrites).

    import sedona_db_spark.api as sedonadb
    con = sedonadb.connect()
    df = con.create_data_frame(pandas_df)
    df.mutate(c=df["a"] + df["b"]).filter(con.col("c") > 2).to_pandas()
"""

from sedona_db_spark.api.errors import SedonaError
from sedona_db_spark.api.expr import (
    Expr,
    Literal,
    SortExpr,
    col,
    lit,
    sort_expr,
)
from sedona_db_spark.api.functions import (
    AggregateUdf,
    Functions,
    GeoFunctions,
    RasterFunctions,
    ScalarUdf,
)
from sedona_db_spark.api.dataframe import DataFrame, GroupedDataFrame
from sedona_db_spark.api.context import SedonaContext, connect

__all__ = [
    "AggregateUdf",
    "DataFrame",
    "Expr",
    "Functions",
    "GeoFunctions",
    "GroupedDataFrame",
    "Literal",
    "RasterFunctions",
    "ScalarUdf",
    "SedonaContext",
    "SedonaError",
    "SortExpr",
    "col",
    "connect",
    "lit",
    "sort_expr",
]
