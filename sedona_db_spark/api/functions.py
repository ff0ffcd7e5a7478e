"""Function-call surface for the user-facing API (reference
python/sedonadb/functions/__init__.py).  ``con.funcs.<name>`` resolves a
scalar or aggregate function from the engine registry (canonicalizing
aliases the way DataFusion does: ``st_geomfromtext`` renders as
``st_geomfromwkt``) and returns a callable that builds an Expr."""

from __future__ import annotations

from typing import Any, Optional

from sedona_db_spark.api.expr import Expr, FunctionNode, _to_node

# Spark builtin aggregates a DataFusion user would reach for; engine
# ST_/RS_ aggregates are appended from the registry below.
_BUILTIN_AGGREGATES = {
    "sum", "count", "min", "max", "avg", "mean", "stddev", "stddev_pop",
    "stddev_samp", "variance", "var_pop", "var_samp", "first", "last",
    "first_value", "last_value", "collect_list", "collect_set",
    "approx_count_distinct", "percentile_approx", "median", "mode",
    "corr", "covar_pop", "covar_samp", "skewness", "kurtosis",
    "bit_and", "bit_or", "bit_xor", "bool_and", "bool_or", "any_value",
    "count_if", "count_distinct", "array_agg", "string_agg",
}

_ENGINE_AGG_NAMES = {
    "st_union_agg", "st_collect_agg", "st_convexhull_agg",
    "st_intersection_agg", "st_polygonize_agg", "st_envelope_agg",
    "st_analyze_agg",
}


def _registry_maps():
    """(alias->canonical, all-canonical-names) over the engine registry.
    Built lazily; KERNELS and the alias table are module-level constants
    in sedona_db_spark.functions."""
    from sedona_db_spark import functions as engine_fns
    canon: set[str] = set()
    alias: dict[str, str] = {}
    for name in engine_fns.KERNELS:
        canon.add(name.lower())
    for a, target in engine_fns._SQL_ALIASES.items():
        alias[a.lower()] = target.lower()
    # the reference registry canonicalizes these (register.rs aliases);
    # this engine carries them as same-impl kernels, so map for display
    # parity (funcs.st_geomfromtext renders as st_geomfromwkt)
    alias.setdefault("st_geomfromtext", "st_geomfromwkt")
    alias.setdefault("st_geogfromtext", "st_geogfromwkt")
    alias.setdefault("st_aswkt", "st_astext")
    alias.setdefault("st_aswkb", "st_asbinary")
    canon |= _ENGINE_AGG_NAMES
    canon.add("sd_simplifystorage")
    return alias, canon


class _UdfBase:
    """Internal function handle; ``name`` is canonical lowercase."""

    def __init__(self, impl, ctx=None, expr: Optional[Expr] = None):
        self._impl = impl
        self._ctx = ctx
        self._expr = expr

    @property
    def name(self) -> str:
        return self._impl

    def __repr__(self) -> str:
        kind = "AggregateUdf" if isinstance(self, AggregateUdf) else "ScalarUdf"
        return f"{kind}({self._impl})"

    def __call__(self, *args: Any) -> Expr:
        nodes = [_to_node(a) for a in args]
        if self._expr is not None:
            nodes.insert(0, _to_node(self._expr))
        node = FunctionNode(self._impl, nodes,
                            aggregate=isinstance(self, AggregateUdf))
        return Expr(node, self._ctx)


class ScalarUdf(_UdfBase):
    """Scalar function handle (reference expr/expression.py:448)."""


class AggregateUdf(_UdfBase):
    """Aggregate function handle (reference expr/expression.py:477)."""


class Functions:
    """``con.funcs`` accessor (reference functions/__init__.py:30).

    Resolution order: engine alias table -> engine registry -> Spark
    catalog (builtins and anything else registered in the session)."""

    def __init__(self, ctx, expr: Optional[Expr] = None):
        self._ctx = ctx
        self._expr = expr

    @property
    def geo(self) -> "GeoFunctions":
        return GeoFunctions(self)

    @property
    def rst(self) -> "RasterFunctions":
        return RasterFunctions(self)

    @property
    def table(self) -> "TableFunctions":
        if self._expr is not None:
            raise ValueError("Expr piping into table functions is not supported")
        return TableFunctions(self._ctx)

    def _resolve(self, name: str) -> tuple[str, bool]:
        """Return (canonical_name, is_aggregate) or raise AttributeError."""
        n = name.lower()
        alias, canon = _registry_maps()
        n = alias.get(n, n)
        if n in canon:
            return n, n in _ENGINE_AGG_NAMES
        if n in _BUILTIN_AGGREGATES:
            return n, True
        # anything else the Spark session can resolve (builtins, macros,
        # raster SQL accessors, text/pipeline UDFs)
        spark = getattr(self._ctx, "_spark", None)
        if spark is not None:
            try:
                if spark.catalog.functionExists(n):
                    return n, False
            except Exception:
                pass
        raise AttributeError(
            f"Can't find scalar or aggregate function '{name}'")

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)
        canonical, is_agg = self._resolve(name)
        cls = AggregateUdf if is_agg else ScalarUdf
        return cls(canonical, self._ctx, self._expr)

    def __getitem__(self, key: str):
        try:
            return self.__getattr__(key)
        except AttributeError:
            raise KeyError(f"Can't find scalar or aggregate function '{key}'")


class _PrefixedFunctions:
    """geo/rst accessor: short pythonic names resolve to the prefixed SQL
    name (``as_text`` -> ``st_astext``, ``band_no_data_value`` ->
    ``rs_bandnodatavalue``), mirroring the reference's generated
    sedonadb_expr package."""

    _prefix = ""

    def __init__(self, funcs: Functions):
        self._funcs = funcs

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)
        candidates = (
            f"{self._prefix}_{name.replace('_', '')}",
            f"{self._prefix}_{name}",
            name,
        )
        last_err = None
        for cand in candidates:
            try:
                return self._funcs.__getattr__(cand)
            except AttributeError as e:
                last_err = e
        raise AttributeError(
            f"Can't find {self._prefix} function '{name}'") from last_err


class GeoFunctions(_PrefixedFunctions):
    _prefix = "st"


class RasterFunctions(_PrefixedFunctions):
    _prefix = "rs"


class TableFunctions:
    """``con.funcs.table`` (reference functions/table.py)."""

    def __init__(self, ctx):
        self._ctx = ctx

    def sd_random_geometry(self, geom_type=None, num_rows=None, *,
                           num_vertices=None, num_parts=None, size=None,
                           bounds=None, hole_rate=None, empty_rate=None,
                           null_rate=None, seed=None):
        import json
        args = {
            "bounds": list(bounds) if bounds is not None else None,
            "empty_rate": empty_rate,
            "geom_type": geom_type,
            "null_rate": null_rate,
            "num_parts": num_parts,
            "hole_rate": hole_rate,
            "seed": seed,
            "size": size,
            "num_rows": num_rows,
            "num_vertices": num_vertices,
        }
        args = {k: v for k, v in args.items() if v is not None}
        return self._ctx.sql(
            f"SELECT * FROM sd_random_geometry('{json.dumps(args)}')")
