"""pytest plugin: run the reference's python expr/ DataFrame-DSL tests
(RETRIEVED PUBLIC CONTENT, /root/reference/python/sedonadb/tests/expr)
natively against this engine's user-facing API.

Usage (what tools/replay_expr_tests.py and the suite gate run):

    python -m pytest /root/reference/python/sedonadb/tests/expr \
        -p no:cacheprovider -p replay_expr_plugin -q

At import time the plugin maps the ``sedonadb`` package names the tests
import onto ``sedona_db_spark.api`` and installs skip-stubs for libraries
absent in this sandbox (shapely / geopandas / geoarrow / pyproj): any
attribute access on those raises a pytest skip, so lib-dependent cases
skip loudly instead of failing or silently passing.  Everything else runs
under REAL pytest semantics — raises(match=...), parametrize, approx —
which is the point: these are Python-surface contracts, graded strictly.
"""

import sys
import types


def _module(name, **attrs):
    m = types.ModuleType(name)
    m.__path__ = []
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _skip_stub(name):
    m = types.ModuleType(name)
    m.__path__ = []

    def _ga(attr, _n=name):
        if attr.startswith("__"):      # introspection (inspect.getmodule,
            raise AttributeError(attr)  # repr machinery) must not skip
        import pytest
        pytest.skip(f"{_n} not available in sandbox",
                    allow_module_level=True)

    m.__getattr__ = _ga
    sys.modules[name] = m
    return m


def _install():
    sys.path.insert(0, "/root/repo")
    import sedona_db_spark.api as api
    import sedona_db_spark.api.functions as api_fns

    root = _module("sedonadb", connect=api.connect,
                   SedonaContext=api.SedonaContext)
    # feature flags the reference exposes; the engine implements the
    # S2-equivalent geography surface natively, so tests gated on
    # s2geography should run
    root.__features__ = ("s2geography",)
    root.datasource = _module(
        "sedonadb.datasource",
        PyogrioFormatSpec=type("PyogrioFormatSpec", (), {}),
        ExternalFormatSpec=type("ExternalFormatSpec", (), {}))
    root.dataframe = _module(
        "sedonadb.dataframe",
        DataFrame=api.DataFrame, GroupedDataFrame=api.GroupedDataFrame)
    expr_pkg = _module(
        "sedonadb.expr",
        Expr=api.Expr, SortExpr=api.SortExpr, Literal=api.Literal,
        col=api.col, lit=api.lit, sort_expr=api.sort_expr)
    expr_pkg.expression = _module(
        "sedonadb.expr.expression",
        Expr=api.Expr, SortExpr=api.SortExpr, col=api.col,
        sort_expr=api.sort_expr, ScalarUdf=api_fns.ScalarUdf,
        AggregateUdf=api_fns.AggregateUdf)
    expr_pkg.literal = _module(
        "sedonadb.expr.literal", lit=api.lit, Literal=api.Literal)
    root._lib = _module("sedonadb._lib", SedonaError=api.SedonaError)
    root.functions = _module(
        "sedonadb.functions", Functions=api_fns.Functions)
    # the generated accessor package the reference gates with importorskip
    _module("sedonadb_expr",
            GeoFunctions=api_fns.GeoFunctions,
            RasterFunctions=api_fns.RasterFunctions)

    # minimal sedonadb.testing: the io tests that drive the DBEngine
    # harness all gate on submodule data (skipped in sandbox); the
    # symbols just need to import and skip loudly if reached
    def _skip_if_not_exists(path):
        import os
        import pytest
        if not os.path.exists(str(path)):
            pytest.skip(f"test data not available: {path}")

    def _geom_or_null(arg, srid=None):
        if arg is None:
            return "NULL"
        if srid is None:
            return f"ST_GeomFromText('{arg}')"
        return f"ST_GeomFromEWKT('SRID={srid};{arg}')"

    class _EngineStub:
        def __init__(self, *a, **k):
            pass

        @classmethod
        def create_or_skip(cls, *a, **k):
            import pytest
            pytest.skip("DBEngine harness not bound in io replay "
                        "(cases gate on submodule data)")

        def __getattr__(self, name):
            import pytest
            pytest.skip("DBEngine harness not bound in io replay")

    root.testing = _module(
        "sedonadb.testing",
        SedonaDB=_EngineStub, DuckDB=_EngineStub, PostGIS=_EngineStub,
        BigQuery=_EngineStub, SedonaDBSingleThread=_EngineStub,
        DuckDBSingleThread=_EngineStub, PostGISSingleThread=_EngineStub,
        geom_or_null=_geom_or_null, geog_or_null=_geom_or_null,
        val_or_null=lambda a: "NULL" if a is None else a,
        skip_if_not_exists=_skip_if_not_exists)

    for lib in ("shapely", "geopandas", "geopandas.testing",
                "geoarrow", "geoarrow.pyarrow", "pyproj", "pyogrio"):
        try:
            __import__(lib)
        except ImportError:
            _skip_stub(lib)


# Documented divergences, each with a reason (mirrors the DIVERGENCES
# list in tools/replay_python_tests.py — never silent skips):
# - WKT writer style: this engine emits the GEOS/DuckDB spaced form
#   ("POINT (1 2)", ", " separators) because the correctness oracle is
#   DuckDB (BASELINE.md) and every WKT-bearing oracle contract hashes
#   against DuckDB's ST_AsText; the reference emits the compact
#   PostGIS-style "POINT(1 2)".  Both are ISO-valid; structural parity
#   is pinned by the replay harness's parser-based comparison.
DIVERGENCES = {
    "test_to_csv_geometry_as_text_ok":
        "WKT writer style (spaced GEOS/DuckDB form vs compact)",
    # environment-blocked: parquet GEOMETRY/GEOGRAPHY logical-type
    # row-group statistics (ColumnChunkMetaData.geo_statistics) need
    # pyarrow >= 19; this sandbox ships 16.1.  The engine's own
    # row-group pruning path (bbox covering columns + footer bbox) is
    # pinned by tests/test_sources_streaming.py instead.
    "test_prune_geography_parquet":
        "parquet GEO logical-type statistics require pyarrow>=19 "
        "(sandbox: 16.1)",
}


def pytest_collection_modifyitems(config, items):
    """Skip tests needing the reference's git-submodule data assets
    (geoarrow-data / sedona-testing, not downloaded in this sandbox) and
    the documented divergences above."""
    import os

    import pytest

    data_ok = os.path.isdir(
        "/root/reference/submodules/geoarrow-data/ns-water")
    data_marker = pytest.mark.skip(
        reason="reference submodule data assets not downloaded in sandbox")
    for item in items:
        if item.name.split("[")[0] in DIVERGENCES:
            item.add_marker(pytest.mark.skip(
                reason=f"documented divergence: "
                       f"{DIVERGENCES[item.name.split('[')[0]]}"))
            continue
        if data_ok:
            continue
        names = getattr(item, "fixturenames", ())
        if "geoarrow_data" in names or "sedona_testing" in names:
            item.add_marker(data_marker)


_install()
