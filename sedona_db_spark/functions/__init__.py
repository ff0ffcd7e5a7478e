"""Function registry: SQL registration + Python `st` namespace.

Registration mirrors the reference's FunctionSet assembly
(/root/reference/rust/sedona/src/context.rs:317-355): one SQL name per
kernel.  In Spark each ST_* name is a vectorized pandas UDF registered with
``spark.udf.register`` so both ``spark.sql("ST_Area(...)")`` and
``st.area(col)`` work.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sedona_db_spark.functions.kernels import KERNELS, make_pandas_udf
from sedona_db_spark.functions import kernels_wave3 as _wave3  # noqa: F401 (merges into KERNELS)
from sedona_db_spark.functions import kernels_wave4 as _wave4  # noqa: F401 (merges into KERNELS)
from sedona_db_spark.functions import geography as _geography  # noqa: F401 (merges into KERNELS)

_REGISTERED_UDFS: dict[str, object] = {}


def get_udf(name: str):
    if name not in _REGISTERED_UDFS:
        _REGISTERED_UDFS[name] = make_pandas_udf(name)
    return _REGISTERED_UDFS[name]


# reference-parity SQL aliases (round 7, register.rs diff): names the
# reference registers for kernels this engine carries under the
# canonical name
_SQL_ALIASES = {
    "ST_AsWKB": "ST_AsBinary",
    "ST_AsWKT": "ST_AsText",
    "ST_GeogFromText": "ST_GeogFromWKT",
    "ST_GeometryFromText": "ST_GeomFromWKT",
    "ST_LineStringFromText": "ST_LineFromText",
}


def register_sql_functions(spark: SparkSession) -> None:
    for name in KERNELS:
        spark.udf.register(name, get_udf(name))
    for alias, target in _SQL_ALIASES.items():
        spark.udf.register(alias, get_udf(target))
    # SD_SimplifyStorage (sd_simplifystorage.rs): strips Arrow view/
    # dictionary/run-end encodings from storage.  Spark SQL's type system
    # never surfaces those encodings, so over this engine's WKB storage
    # model the function is the identity — registered for source parity.
    spark.udf.register("SD_SimplifyStorage", lambda b: b, "binary")
    # pipeline (text/dedup/similarity) SQL functions
    from sedona_db_spark.functions import text as _text
    _text.register(spark)
    # raster RS_* SQL subset (metadata accessors are native Column API)
    from sedona_db_spark.functions import raster as _raster
    _raster.register(spark)
    # geometry aggregates (ST_Union_Agg etc.) as SQL grouped aggregates
    from sedona_db_spark.functions import aggregates as _aggs
    _aggs.register(spark)


def call(name: str, *cols):
    """Invoke an ST_* kernel on Columns from Python."""
    cols = [c if not isinstance(c, (int, float, str)) else F.lit(c) for c in cols]
    return get_udf(name)(*cols)


class _St:
    """`st.area(col)`-style namespace (reference: sedonadb.functions)."""

    def __getattr__(self, item: str):
        target = None
        for name in KERNELS:
            if name.lower() == f"st_{item.lower()}":
                target = name
                break
        if target is None:
            raise AttributeError(f"no ST function st_{item}")

        def fn(*cols):
            return call(target, *cols)
        fn.__name__ = target
        return fn


st = _St()
