"""User-facing DataFrame (reference python/sedonadb/dataframe.py),
re-expressed over a PySpark DataFrame.

Design notes for scale: every method is a thin declarative wrapper — the
underlying object stays a lazy Spark plan, so Catalyst sees the whole
pipeline (pushdown, pruning, join planning all apply).  The aggregate
path renders to SQL and routes through the engine's SQL front door so the
``ST_*_Agg`` rewrites and spatial-join planning participate.  Only the
explicitly-materializing methods (``to_pandas``, ``to_arrow_table``,
single-file writers) collect to the driver."""

from __future__ import annotations

import itertools
from typing import Any, Dict, List, Optional, Union

from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.utils import AnalysisException

from sedona_db_spark.api.errors import SedonaError
from sedona_db_spark.api.expr import (
    ColumnNode,
    Expr,
    Literal,
    SortExpr,
    InternalSortExpr,
)

_JOIN_TYPES = {
    "inner": "inner",
    "left": "left",
    "right": "right",
    "outer": "outer",
    "full": "outer",
    "left_semi": "left_semi",
    "semi": "left_semi",
    "left_anti": "left_anti",
    "anti": "left_anti",
    "right_semi": "right_semi",
    "right_anti": "right_anti",
}

_tmp_view_counter = itertools.count()


class DataFrame:
    """Lazy result of a query (reference dataframe.py:34)."""

    def __init__(self, ctx, sdf, alias: Optional[str] = None):
        self._ctx = ctx
        self._sdf = sdf
        self._alias = alias
        self._geo_cols = {}        # {col: crs} known geometry columns
        self._validate_wkb = False

    # -- construction helpers ------------------------------------------
    def _new(self, sdf) -> "DataFrame":
        out = DataFrame(self._ctx, sdf, self._alias)
        out._geo_cols = {c: crs for c, crs in self._geo_cols.items()
                         if c in sdf.columns}
        out._validate_wkb = self._validate_wkb
        return out

    def _guard(self, fn):
        """Run a plan-building callable; analysis errors surface as
        SedonaError with the valid field list appended (the reference
        pins that the message names the valid fields)."""
        try:
            return fn()
        except AnalysisException as e:
            raise SedonaError(
                f"{e} Valid fields: {list(self._sdf.columns)}") from e

    def _compile(self, expr: Expr):
        return self._guard(lambda: expr._impl.to_spark())

    # -- introspection --------------------------------------------------
    @property
    def schema(self):
        return self._sdf.schema

    @property
    def columns(self) -> List[str]:
        return list(self._sdf.columns)

    def head(self, n: int = 5) -> "DataFrame":
        return self._new(self._sdf.limit(n))

    def alias(self, name: str) -> "DataFrame":
        return DataFrame(self._ctx, self._sdf.alias(name), alias=name)

    def __getitem__(self, key: Union[str, int]) -> Expr:
        cols = self.columns
        # bool is a subclass of int: guard explicitly so df[True] doesn't
        # silently mean df[1]
        if isinstance(key, bool):
            raise TypeError("DataFrame[...] with bool is not supported")
        if isinstance(key, int):
            if key < -len(cols) or key >= len(cols):
                raise IndexError(
                    f"column index {key} out of range for {len(cols)} "
                    f"column(s)")
            return self._col_expr(cols[key])
        if isinstance(key, str):
            if key not in cols:
                raise KeyError(
                    f"Column '{key}' not found. Available columns: {cols}")
            return self._col_expr(key)
        if isinstance(key, list):
            raise TypeError(
                "DataFrame[[...]] is not supported; use df.select(...)")
        if isinstance(key, Expr):
            raise TypeError(
                "DataFrame[Expr] is not supported; use df.filter(...)")
        raise TypeError(
            f"DataFrame[...] with {type(key).__name__} is not supported")

    def _col_expr(self, name: str) -> Expr:
        return Expr(ColumnNode(name, qualifier=self._alias,
                               source=self._sdf), self._ctx)

    def __getattr__(self, name: str) -> Expr:
        if name.startswith("_"):
            raise AttributeError(name)
        cols = self._sdf.columns
        if name in cols:
            return self._col_expr(name)
        raise AttributeError(
            f"Column '{name}' not found. Available columns: {list(cols)}")

    def __dir__(self):
        return list(super().__dir__()) + list(self._sdf.columns)

    def _ipython_key_completions_(self):
        return list(self._sdf.columns)

    # -- projection -----------------------------------------------------
    def _validate_str_col(self, name: str) -> None:
        if name not in self._sdf.columns:
            raise SedonaError(
                f"No field named '{name}'. "
                f"Valid fields: {list(self._sdf.columns)}")

    def select(self, *exprs, **named_exprs) -> "DataFrame":
        if not exprs and not named_exprs:
            raise ValueError(
                "select() requires at least one column or expression")
        cols = []
        for e in exprs:
            if isinstance(e, str):
                self._validate_str_col(e)
                cols.append(F.col(e))
            elif isinstance(e, Expr):
                c = self._compile(e)
                name = e._output_name()
                cols.append(c.alias(name))
            else:
                raise TypeError(
                    "select() expects str, Expr, or Literal arguments, got "
                    f"{type(e).__name__}")
        for name, e in named_exprs.items():
            if isinstance(e, str):
                self._validate_str_col(e)
                cols.append(F.col(e).alias(name))
            elif isinstance(e, Expr):
                cols.append(self._compile(e).alias(name))
            else:
                raise TypeError(
                    "select() keyword arguments expect str, Expr, or "
                    f"Literal values, got {type(e).__name__}")
        return self._new(self._guard(lambda: self._sdf.select(*cols)))

    def filter(self, *exprs: Expr) -> "DataFrame":
        if not exprs:
            raise ValueError("filter() requires at least one predicate")
        for e in exprs:
            if isinstance(e, Literal):
                raise TypeError(
                    "filter() does not accept a bare Literal — pass a "
                    "boolean Expr (e.g. col('x') > 0)")
            if not isinstance(e, Expr):
                raise TypeError(
                    "filter() expects Expr predicates, got "
                    f"{type(e).__name__}")
        cond = None
        for e in exprs:
            c = self._compile(e)
            cond = c if cond is None else (cond & c)
        return self._new(self._guard(lambda: self._sdf.filter(cond)))

    def sort(self, *keys) -> "DataFrame":
        if not keys:
            raise ValueError("sort() requires at least one sort key")
        cols = []
        for k in keys:
            if isinstance(k, str):
                self._validate_str_col(k)
                cols.append(F.col(k).asc_nulls_last())
            elif isinstance(k, SortExpr):
                cols.append(self._guard(lambda k=k: k._impl.to_spark()))
            elif isinstance(k, Expr):
                cols.append(self._guard(
                    lambda k=k: InternalSortExpr(k._impl, True, False)
                    .to_spark()))
            else:
                raise TypeError(
                    "sort() expects str, Expr, or SortExpr keys, got "
                    f"{type(k).__name__}")
        return self._new(self._guard(lambda: self._sdf.orderBy(*cols)))

    def drop(self, *cols: str) -> "DataFrame":
        if not cols:
            raise ValueError("drop() requires at least one column name")
        for c in cols:
            if not isinstance(c, str):
                raise TypeError(
                    f"drop() expects str arguments, got {type(c).__name__}")
        missing = [c for c in cols if c not in self._sdf.columns]
        if missing:
            raise KeyError(
                f"Column(s) {missing} not found. Available columns: "
                f"{list(self._sdf.columns)}")
        keep = [c for c in self._sdf.columns if c not in set(cols)]
        return self._new(self._sdf.select(*keep))

    def unnest(self, *columns: str) -> "DataFrame":
        if not columns:
            raise ValueError("unnest() requires at least one column")
        for c in columns:
            if not isinstance(c, str):
                raise TypeError(
                    f"unnest() expects str arguments, got {type(c).__name__}")
        schema = {f.name: f.dataType for f in self._sdf.schema.fields}
        for c in columns:
            if c not in schema:
                raise SedonaError(
                    f"No field named '{c}'. "
                    f"Valid fields: {list(self._sdf.columns)}")
            if not isinstance(schema[c], T.ArrayType):
                raise SedonaError(
                    f"Cannot unnest column '{c}' of type "
                    f"{schema[c].simpleString()}")
        targets = set(columns)
        if len(columns) == 1:
            c = columns[0]
            cols = [F.explode(F.col(c)).alias(c) if name == c else F.col(name)
                    for name in self._sdf.columns]
            return self._new(self._sdf.select(*cols))
        # multiple columns unnest position-by-position (parallel, not a
        # cross product): zip the arrays, explode once, re-project in place
        tmp = "__unnest_zip"
        zipped = self._sdf.withColumn(
            tmp, F.explode(F.arrays_zip(*[F.col(c) for c in columns])))
        cols = [F.col(tmp)[name].alias(name) if name in targets
                else F.col(name)
                for name in self._sdf.columns]
        return self._new(zipped.select(*cols))

    # -- aggregation ----------------------------------------------------
    def _collect_agg_exprs(self, exprs, named_exprs) -> List[str]:
        if not exprs and not named_exprs:
            raise ValueError(
                "agg() requires at least one aggregate expression")
        from sedona_db_spark.api.expr import AliasNode

        def render(e: Expr, name: str) -> str:
            node = e._impl
            while isinstance(node, AliasNode):
                node = node.child
            alias = name if name.isidentifier() else f"`{name}`"
            return f"{node.to_sql()} AS {alias}"

        out = []
        for e in exprs:
            if not isinstance(e, Expr):
                raise TypeError(
                    f"agg() expects Expr arguments, got {type(e).__name__}")
            out.append(render(e, e._output_name()))
        for name, e in named_exprs.items():
            if not isinstance(e, Expr):
                raise TypeError(
                    "agg() expects Expr keyword values, got "
                    f"{type(e).__name__}")
            out.append(render(e, name))
        return out

    def _sql_over_self(self, select_list: List[str],
                       group_by: Optional[List[str]] = None) -> "DataFrame":
        """Render a single-table SQL query over this plan and run it
        through the engine front door (ST_*_Agg rewrites included)."""
        view = f"__sedona_api_tmp_{next(_tmp_view_counter)}"
        self._sdf.createOrReplaceTempView(view)
        q = f"SELECT {', '.join(select_list)} FROM {view}"
        if group_by:
            q += f" GROUP BY {', '.join(group_by)}"
        try:
            out = self._guard(lambda: self._ctx._spark.sql(q))
        finally:
            self._ctx._spark.catalog.dropTempView(view)
        return DataFrame(self._ctx, out)

    def agg(self, *exprs: Expr, **named_exprs: Expr) -> "DataFrame":
        return self._sql_over_self(
            self._collect_agg_exprs(exprs, named_exprs))

    def group_by(self, *keys) -> "GroupedDataFrame":
        if not keys:
            raise ValueError("group_by() requires at least one key")
        key_exprs = []
        for k in keys:
            if isinstance(k, str):
                self._validate_str_col(k)
                key_exprs.append(self._col_expr(k))
            elif isinstance(k, Expr):
                key_exprs.append(k)
            else:
                raise TypeError(
                    "group_by() expects str or Expr keys, got "
                    f"{type(k).__name__}")
        return GroupedDataFrame(self, key_exprs)

    # -- joins ----------------------------------------------------------
    def join(self, other: "DataFrame", on, how: str = "inner") -> "DataFrame":
        if not isinstance(other, DataFrame):
            raise TypeError(
                "join() expects a DataFrame, got "
                f"{type(other).__name__}")
        if how not in _JOIN_TYPES:
            raise ValueError(
                f"`how` must be one of {sorted(set(_JOIN_TYPES))}, got "
                f"{how!r}")
        spark_how = _JOIN_TYPES[how]

        if isinstance(on, (str, Expr)):
            on = [on]
        if not isinstance(on, list):
            raise TypeError(
                "`on` expects str, Expr, or a list of either, got "
                f"{type(on).__name__}")
        if not on:
            raise ValueError("`on` requires at least one element")
        if all(isinstance(k, str) for k in on):
            missing_left = [k for k in on if k not in self._sdf.columns]
            missing_right = [k for k in on if k not in other._sdf.columns]
            if missing_left or missing_right:
                raise KeyError(
                    f"Join key(s) not found — left: {missing_left}, "
                    f"right: {missing_right}")
            if spark_how in ("right_semi", "right_anti"):
                flipped = "left_semi" if spark_how == "right_semi" \
                    else "left_anti"
                out = other._sdf.join(self._sdf, on=list(on), how=flipped)
            else:
                out = self._sdf.join(other._sdf, on=list(on), how=spark_how)
            return DataFrame(self._ctx, out)
        if all(isinstance(k, Expr) for k in on):
            cond = None
            for k in on:
                c = self._guard(lambda k=k: k._impl.to_spark())
                cond = c if cond is None else (cond & c)
            if spark_how in ("right_semi", "right_anti"):
                flipped = "left_semi" if spark_how == "right_semi" \
                    else "left_anti"
                out = other._sdf.join(self._sdf, on=cond, how=flipped)
            else:
                out = self._sdf.join(other._sdf, on=cond, how=spark_how)
            return DataFrame(self._ctx, out)
        raise TypeError(
            "`on` list elements must be only str or only Expr")

    def cross_join(self, other: "DataFrame") -> "DataFrame":
        if not isinstance(other, DataFrame):
            raise TypeError(
                "cross_join() expects a DataFrame, got "
                f"{type(other).__name__}")
        return DataFrame(self._ctx, self._sdf.crossJoin(other._sdf))

    # -- distinct / set ops --------------------------------------------
    def distinct(self) -> "DataFrame":
        return self._new(self._sdf.distinct())

    def distinct_on(self, *cols) -> "DataFrame":
        if not cols:
            raise ValueError("distinct_on() requires at least one column")
        keys = []
        for c in cols:
            if isinstance(c, str):
                self._validate_str_col(c)
                keys.append(F.col(c))
            elif isinstance(c, Expr):
                keys.append(self._compile(c))
            else:
                raise TypeError(
                    "distinct_on() expects str or Expr columns, got "
                    f"{type(c).__name__}")
        from pyspark.sql.window import Window
        w = Window.partitionBy(*keys).orderBy(F.lit(1))
        rn = "__distinct_on_rn"
        out = (self._sdf.withColumn(rn, F.row_number().over(w))
               .filter(F.col(rn) == 1).drop(rn))
        return self._new(out)

    def _check_set_op_compatible(self, other: "DataFrame",
                                 method: str) -> None:
        if not isinstance(other, DataFrame):
            raise TypeError(
                f"{method}() expects a DataFrame, got "
                f"{type(other).__name__}")
        if list(self._sdf.columns) != list(other._sdf.columns):
            raise ValueError(
                f"{method}() requires both sides to have the same column "
                f"names; left={list(self._sdf.columns)} "
                f"right={list(other._sdf.columns)}")

    def union(self, other: "DataFrame") -> "DataFrame":
        self._check_set_op_compatible(other, "union")
        return self._new(self._sdf.unionAll(other._sdf))

    def union_distinct(self, other: "DataFrame") -> "DataFrame":
        self._check_set_op_compatible(other, "union_distinct")
        return self._new(self._sdf.unionAll(other._sdf).distinct())

    def intersect(self, other: "DataFrame") -> "DataFrame":
        self._check_set_op_compatible(other, "intersect")
        return self._new(self._sdf.intersectAll(other._sdf))

    def intersect_distinct(self, other: "DataFrame") -> "DataFrame":
        self._check_set_op_compatible(other, "intersect_distinct")
        return self._new(self._sdf.intersect(other._sdf))

    def except_distinct(self, other: "DataFrame") -> "DataFrame":
        self._check_set_op_compatible(other, "except_distinct")
        return self._new(self._sdf.subtract(other._sdf))

    # -- column editing -------------------------------------------------
    def mutate(self, *exprs, **named_exprs) -> "DataFrame":
        if not exprs and not named_exprs:
            raise ValueError("mutate() requires at least one column")
        updates: Dict[str, Any] = {}
        order: List[str] = []

        def add(name: str, column) -> None:
            if name not in updates:
                order.append(name)
            updates[name] = column

        for e in exprs:
            if not isinstance(e, Expr):
                raise TypeError(
                    "mutate() expects str, Expr, or Literal values, got "
                    f"{type(e).__name__}")
            add(e._output_name(), self._compile(e))
        for name, e in named_exprs.items():
            if isinstance(e, str):
                self._validate_str_col(e)
                add(name, F.col(e))
            elif isinstance(e, Expr):
                add(name, self._compile(e))
            else:
                raise TypeError(
                    "mutate() expects str, Expr, or Literal values, got "
                    f"{type(e).__name__}")

        existing = list(self._sdf.columns)
        cols = []
        for c in existing:
            if c in updates:
                cols.append(updates[c].alias(c))
            else:
                cols.append(F.col(c))
        for name in order:
            if name not in existing:
                cols.append(updates[name].alias(name))
        return self._new(self._guard(lambda: self._sdf.select(*cols)))

    def rename(self, *args: Any, **new_to_old: str) -> "DataFrame":
        if args:
            if len(args) == 1 and isinstance(args[0], dict) and args[0]:
                old, new = next(iter(args[0].items()))
                raise TypeError(
                    "rename() expects keyword arguments mapping "
                    f'new=\"old\", e.g. rename({new}="{old}")')
            raise TypeError(
                'rename() expects keyword arguments mapping new="old", '
                'e.g. rename(new_name="old_name")')
        if not new_to_old:
            raise ValueError("rename() requires at least one mapping")
        for new, old in new_to_old.items():
            if not isinstance(old, str):
                raise TypeError(
                    "rename() expects the existing column name as a str, "
                    f"got {type(old).__name__}")
        cols_now = list(self._sdf.columns)
        for new, old in new_to_old.items():
            if old not in cols_now:
                raise KeyError(
                    f"Column '{old}' not found. Available columns: "
                    f"{cols_now}")
        old_to_new = {old: new for new, old in new_to_old.items()}
        cols = [F.col(c).alias(old_to_new[c]) if c in old_to_new
                else F.col(c) for c in cols_now]
        return self._new(self._sdf.select(*cols))

    # -- row slicing ----------------------------------------------------
    def limit(self, n: Optional[int], /, *, offset: int = 0) -> "DataFrame":
        sdf = self._sdf
        if offset:
            sdf = sdf.offset(offset)
        if n is not None:
            sdf = sdf.limit(n)
        return self._new(sdf)

    # -- execution ------------------------------------------------------
    def execute(self) -> None:
        self._sdf.count()

    def count(self) -> int:
        return self._sdf.count()

    def __len__(self) -> int:
        return self.count()

    # -- interop --------------------------------------------------------
    def to_arrow_table(self, schema: Any = None):
        tbl = self._sdf.toArrow()
        if self._geo_cols:
            from sedona_db_spark.api import io as _io
            tbl = _io.wrap_geo_columns(tbl, self._geo_cols,
                                       validate=self._validate_wkb)
        if schema is not None:
            tbl = tbl.cast(schema)
        return tbl

    def arrow(self, *, simplify: bool = False):
        return self.to_arrow_reader(simplify=simplify)

    def to_arrow_reader(self, *, simplify: bool = False):
        import pyarrow as pa
        tbl = self.to_arrow_table()
        return pa.RecordBatchReader.from_batches(
            tbl.schema, tbl.to_batches())

    def __arrow_c_schema__(self):
        return self.to_arrow_table().schema.__arrow_c_schema__()

    def __arrow_c_stream__(self, requested_schema: Any = None):
        return self.to_arrow_table().__arrow_c_stream__(requested_schema)

    def to_pandas(self):
        return self._sdf.toPandas()

    def to_view(self, name: str, overwrite: bool = False):
        if overwrite:
            self._sdf.createOrReplaceTempView(name)
        else:
            self._sdf.createTempView(name)
        return self._ctx.view(name)

    def to_memtable(self) -> "DataFrame":
        spark = self._ctx._spark
        return DataFrame(self._ctx, spark.createDataFrame(self.to_pandas(),
                                                          self._sdf.schema))

    # -- writers --------------------------------------------------------
    # Path with a matching file suffix -> ONE file (the reference's
    # single-file contract, driver-side Arrow); any other path -> the
    # distributed Spark/engine writers (GeoParquet footer + spatial sort
    # for geometry — the 100 TB path).  See api/io.py.
    def to_parquet(self, path, **kwargs) -> None:
        from sedona_db_spark.api import io as _io
        _io.to_parquet(self, path, **kwargs)

    def to_csv(self, path, **kwargs) -> None:
        from sedona_db_spark.api import io as _io
        _io.to_csv(self, path, **kwargs)

    def to_json(self, path) -> None:
        from sedona_db_spark.api import io as _io
        _io.to_json(self, path)

    # -- display --------------------------------------------------------
    def show(self, limit: int = 10, **kwargs) -> None:
        self._sdf.show(n=limit, truncate=False)

    def explain(self, mode: str = "standard") -> None:
        mode_map = {"standard": "simple", "extended": "extended",
                    "analyze": "cost", "formatted": "formatted"}
        self._sdf.explain(mode=mode_map.get(mode, mode))

    def __repr__(self) -> str:
        cols = ", ".join(
            f"{f.name}: {f.dataType.simpleString()}"
            for f in self._sdf.schema.fields)
        return f"DataFrame[{cols}]"


class GroupedDataFrame:
    """Produced by DataFrame.group_by (reference dataframe.py:1920)."""

    def __init__(self, df: DataFrame, group_exprs: List[Expr]):
        self._df = df
        self._group_exprs = group_exprs

    def agg(self, *exprs: Expr, **named_exprs: Expr) -> DataFrame:
        agg_list = self._df._collect_agg_exprs(exprs, named_exprs)
        select_list = []
        group_list = []
        for k in self._group_exprs:
            sql = k._impl.to_sql()
            name = k._output_name()
            from sedona_db_spark.api.expr import AliasNode
            if isinstance(k._impl, AliasNode):
                group_list.append(k._impl.child.to_sql())
            else:
                group_list.append(sql)
            if name.isidentifier():
                select_list.append(f"{group_list[-1]} AS {name}")
            else:
                select_list.append(f"{group_list[-1]} AS `{name}`")
        select_list.extend(agg_list)
        return self._df._sql_over_self(select_list, group_by=group_list)
