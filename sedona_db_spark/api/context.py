"""SedonaContext / connect() (reference python/sedonadb/context.py).

``connect()`` builds (or reuses) the engine Spark session with every
ST_/RS_/pipeline function registered and the SQL front door installed, so
``con.sql(...)`` plans spatial joins through the engine operators."""

from __future__ import annotations

import re
from typing import Any, Optional

from pyspark.sql.utils import AnalysisException

from sedona_db_spark.api.dataframe import DataFrame
from sedona_db_spark.api.errors import SedonaError
from sedona_db_spark.api.expr import Expr, Literal, col as _col, lit as _lit
from sedona_db_spark.api.functions import Functions

# DataFusion SQL accepts [1, 2, 3] array literals; Spark spells that
# array(1, 2, 3).  Rewrite bracket literals that are NOT subscripts (the
# previous non-space char would be an identifier/closing bracket) and not
# inside string literals.
_BRACKET = re.compile(r"\[")


def _dialect_shim(query: str) -> str:
    if "[" not in query:
        return query
    out = []
    i, n = 0, len(query)
    in_str = None
    while i < n:
        ch = query[i]
        if in_str:
            out.append(ch)
            if ch == in_str:
                in_str = None
            i += 1
            continue
        if ch in ("'", '"'):
            in_str = ch
            out.append(ch)
            i += 1
            continue
        prev = query[i - 1] if i else ""
        if ch == "[" and not (prev.isalnum() or prev in ")]_`"):
            # array literal: find matching bracket (no nesting of
            # subscripts inside literals in practice; handle nesting)
            depth = 1
            j = i + 1
            while j < n and depth:
                cj = query[j]
                if cj in ("'", '"'):
                    q = cj
                    j += 1
                    while j < n and query[j] != q:
                        j += 1
                elif cj == "[":
                    depth += 1
                elif cj == "]":
                    depth -= 1
                j += 1
            inner = _dialect_shim(query[i + 1:j - 1])
            # DataFusion integer literals are Int64; Spark SQL's are INT.
            # Suffix bare ints inside the rewritten array literal so the
            # element type matches the reference (array(10L, 20L)).
            inner = re.sub(r"(?<![\w.'\"])(\d+)(?![\w.'\"])", r"\1L", inner)
            out.append(f"array({inner})")
            i = j
            continue
        out.append(ch)
        i += 1
    return "".join(out)


class SedonaContext:
    """A connection to the engine (reference context.py:61)."""

    def __init__(self, spark=None):
        if spark is None:
            from sedona_db_spark.session import get_spark, register_all
            spark = get_spark("sedona_db_spark_api")
            register_all(spark)
        self._spark = spark

    # -- data in --------------------------------------------------------
    def create_data_frame(self, obj: Any, schema: Any = None) -> DataFrame:
        import pandas as pd
        import pyarrow as pa

        if isinstance(obj, DataFrame):
            return obj
        if isinstance(obj, pd.DataFrame):
            sdf = self._spark.createDataFrame(obj, schema=schema)
            return DataFrame(self, sdf)
        if isinstance(obj, (pa.Table, pa.RecordBatch)):
            if isinstance(obj, pa.RecordBatch):
                obj = pa.Table.from_batches([obj])
            sdf = self._spark.createDataFrame(obj, schema=schema)
            return DataFrame(self, sdf)
        if isinstance(obj, pa.RecordBatchReader):
            return self.create_data_frame(obj.read_all(), schema)
        if isinstance(obj, dict):
            return self.create_data_frame(pd.DataFrame(obj), schema)
        if hasattr(obj, "__arrow_c_stream__"):
            return self.create_data_frame(
                pa.table(obj), schema)
        if hasattr(obj, "__dataframe__") or hasattr(obj, "to_pandas"):
            return self.create_data_frame(pd.DataFrame(obj), schema)
        if isinstance(obj, list):
            sdf = self._spark.createDataFrame(obj, schema=schema)
            return DataFrame(self, sdf)
        raise TypeError(
            f"Can't create DataFrame from object of type "
            f"{type(obj).__name__}")

    def view(self, name: str) -> DataFrame:
        try:
            return DataFrame(self, self._spark.table(name))
        except AnalysisException as e:
            raise SedonaError(str(e)) from e

    def drop_view(self, name: str) -> None:
        dropped = self._spark.catalog.dropTempView(name)
        if not dropped:
            dropped = self._spark.catalog.dropGlobalTempView(name)
        if not dropped:
            raise SedonaError(f"View '{name}' not found")

    # -- readers --------------------------------------------------------
    @property
    def read(self):
        from sedona_db_spark.api.io import Read
        return Read(self)

    def read_parquet(self, paths, **options) -> DataFrame:
        from sedona_db_spark.api.io import read_parquet
        return read_parquet(self, paths, **options)

    # -- SQL ------------------------------------------------------------
    def sql(self, query: str, **kwargs) -> DataFrame:
        query = _dialect_shim(query)
        query = self._table_function_shim(query)
        # session-scoped views: the reference's CREATE VIEW is
        # connection-local, which in Spark is a TEMPORARY view
        query = re.sub(r"(?i)^(\s*CREATE)(\s+OR\s+REPLACE)?(\s+VIEW\b)",
                       lambda m: f"{m.group(1)}{m.group(2) or ''} TEMPORARY"
                                 f"{m.group(3)}", query)
        try:
            sdf = self._spark.sql(query)
        except AnalysisException as e:
            raise SedonaError(str(e)) from e
        return DataFrame(self, sdf)

    _TF_RE = re.compile(r"(?i)\bsd_random_geometry\s*\(\s*'([^']*)'\s*\)")

    def _table_function_shim(self, query: str) -> str:
        """FROM sd_random_geometry('{json}') -> a registered temp view of
        the engine's seeded generator (Spark SQL has no Python table
        functions in FROM)."""
        import json as _json

        def sub(m):
            from sedona_db_spark.functions.table_functions import \
                sd_random_geometry
            opts = _json.loads(m.group(1) or "{}")
            df = sd_random_geometry(self._spark, opts)
            name = f"__sd_random_geometry_{abs(hash(m.group(1))) % 10**9}"
            df.createOrReplaceTempView(name)
            return name

        return self._TF_RE.sub(sub, query)

    # -- expressions ----------------------------------------------------
    @property
    def funcs(self) -> Functions:
        return Functions(self)

    def col(self, name: str, qualifier: Optional[str] = None) -> Expr:
        return _col(name, qualifier, ctx=self)

    def lit(self, value: Any) -> Literal:
        return _lit(value, ctx=self)

    # -- registration ---------------------------------------------------
    def register(self, component: Any, **kwargs: Any) -> None:
        """Register a user function: a plain callable registers as a
        Spark UDF under its __name__ (see functions/udf.py for the full
        typed-UDF surface)."""
        name = kwargs.pop("name", None) or getattr(
            component, "__name__", None)
        if name is None:
            raise TypeError("register() needs a function with a __name__")
        self._spark.udf.register(name, component)


def connect() -> SedonaContext:
    return SedonaContext()
