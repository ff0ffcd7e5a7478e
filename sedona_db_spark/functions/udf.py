"""User-defined function surface — SURVEY §2.9.

Reference: `@sedonadb.udf.arrow_udf(input_types, return_type)` over pyarrow
arrays with geometry matchers (/root/reference/python/sedonadb/python/
sedonadb/udf.py:38-258) and the `@arrow_aggregate_udf` class protocol
`__init__/update/state/merge/evaluate` (udf.py:327-427), registered via
`context.py:438 register()`.

Spark design:
- `@geometry_udf(returns=...)`: wraps a row-vectorized python function into
  an Arrow-batched pandas UDF; parameters annotated (or listed) as geometry
  arrive as decoded `Geom` objects and a returned `Geom` is re-encoded to
  WKB — the same convenience the reference's geometry matchers give.
- `@batch_udf(returns=...)`: raw pandas-Series-in/Series-out (the closest
  analogue to arrow arrays; power users who want full vectorization).
- `aggregate_udf(cls, ...)`: reference-protocol aggregate class adapted to
  Spark via two-phase applyInPandas (partial per partition, merge final) —
  the update/merge split maps exactly onto Spark's partial aggregation, so
  it scales like a built-in agg (map-side combine, no driver involvement).
- `register(spark, name, fn)`: SQL registration, mirroring FunctionSet
  registration (/root/reference/rust/sedona/src/context.rs:317-355).
"""

from __future__ import annotations

import inspect
from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sedona_db_spark.geom import core
from sedona_db_spark.geom.core import Geom

GEOMETRY = "geometry"          # type marker for input/return specs

_TYPE_ALIASES = {
    "geometry": T.BinaryType(), "double": T.DoubleType(),
    "float": T.DoubleType(), "int": T.LongType(), "long": T.LongType(),
    "string": T.StringType(), "bool": T.BooleanType(),
    "binary": T.BinaryType(),
}


def _resolve_type(t):
    if isinstance(t, str):
        return _TYPE_ALIASES.get(t.lower()) or T._parse_datatype_string(t)
    return t


def geometry_udf(returns="geometry", geometry_args: list[str] | None = None):
    """Decorator: scalar python fn over decoded Geoms -> pandas UDF.

    >>> @geometry_udf(returns="double")
    ... def my_area2(g: Geom) -> float:
    ...     return 2 * area_of(g)

    Args whose annotation is `Geom` (or whose name is listed in
    `geometry_args`) are WKB-decoded; a `Geom` return value is re-encoded.
    """
    ret = _resolve_type(returns)
    is_geom_ret = isinstance(returns, str) and returns.lower() == "geometry"

    def deco(fn: Callable):
        sig = inspect.signature(fn)
        params = list(sig.parameters)
        gargs = set(geometry_args or [])
        for p in sig.parameters.values():
            if p.annotation is Geom:
                gargs.add(p.name)
        gmask = [p in gargs for p in params]

        def batch(*cols: pd.Series) -> pd.Series:
            n = len(cols[0])
            decoded = []
            for isg, c in zip(gmask, cols):
                if isg:
                    decoded.append([None if b is None else core.from_wkb(b)
                                    for b in c])
                else:
                    decoded.append(list(c))
            out = []
            for row in zip(*decoded):
                if any(v is None for v in row):
                    out.append(None)
                    continue
                r = fn(*row)
                if is_geom_ret and isinstance(r, Geom):
                    r = core.to_wkb(r)
                out.append(r)
            return pd.Series(out, dtype=object)

        from sedona_db_spark.functions.kernels import _wrap_arity
        udf = F.pandas_udf(_wrap_arity(batch, len(params)), returnType=ret)
        udf.__wrapped__ = fn
        udf._is_geometry_udf = True
        return udf
    return deco


def batch_udf(returns):
    """Raw Arrow-batch UDF: pandas Series in/out (reference arrow_udf with
    `num_rows`/arrays — full vectorization, no per-row dispatch)."""
    ret = _resolve_type(returns)

    def deco(fn: Callable):
        n = len(inspect.signature(fn).parameters)
        from sedona_db_spark.functions.kernels import _wrap_arity
        return F.pandas_udf(_wrap_arity(fn, n), returnType=ret)
    return deco


def register(spark: SparkSession, name: str, udf) -> None:
    """SQL-register a udf produced by the decorators above."""
    spark.udf.register(name, udf)


# ----------------------------------------------------------------------
# aggregate protocol (reference udf.py:327-427) via two-phase applyInPandas
# ----------------------------------------------------------------------

def aggregate_udf(df: DataFrame, group_cols: list[str], agg_cls,
                  value_cols: list[str], out_field: str = "agg",
                  out_type="double") -> DataFrame:
    """Run a reference-protocol aggregate class over groups.

    agg_cls protocol (exactly the reference's): `__init__()`,
    `update(*value_series)` consuming one batch, `state()` -> picklable,
    `merge(state)` folding another instance's state, `evaluate()` -> value.

    Execution: stage 1 is a TRUE map-side combine — `mapInPandas` folds
    every partition into one state per group-within-partition (no shuffle
    of raw rows); stage 2 shuffles only the small pickled states and
    merges per group.  This is the partial/final accumulator split of the
    reference's Arrow UDAF plumbing: state size, not data size, crosses
    the wire — the property that makes a custom agg survive 100 TB.
    """
    import pickle
    from collections.abc import Iterator

    out_t = _resolve_type(out_type)
    cols = group_cols + ["__state"]
    state_schema = T.StructType(
        [df.schema[c] for c in group_cols] +
        [T.StructField("__state", T.BinaryType())])

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        accs: dict = {}
        for pdf in batches:
            for key, sub in pdf.groupby(group_cols, dropna=False, sort=False):
                if not isinstance(key, tuple):
                    key = (key,)
                acc = accs.get(key)
                if acc is None:
                    accs[key] = acc = agg_cls()
                acc.update(*[sub[c] for c in value_cols])
        rows = [dict(zip(group_cols, key)) | {"__state": pickle.dumps(a.state())}
                for key, a in accs.items()]
        yield pd.DataFrame(rows, columns=cols)

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = agg_cls()
        for blob in pdf["__state"]:
            acc.merge(pickle.loads(bytes(blob)))
        row = {c: pdf[c].iloc[0] for c in group_cols}
        row[out_field] = acc.evaluate()
        return pd.DataFrame([row])

    out_schema = T.StructType(
        [df.schema[c] for c in group_cols] +
        [T.StructField(out_field, out_t)])

    partials = df.select(*group_cols, *value_cols) \
        .mapInPandas(partial, state_schema)
    return partials.groupBy(*group_cols).applyInPandas(final, out_schema)
