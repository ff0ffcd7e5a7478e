"""Expression IR for the user-facing API.

The reference exposes a DataFusion-backed Expr DSL
(python/sedonadb/python/sedonadb/expr/expression.py, expr/literal.py); its
tests pin the internal handle's ``variant_name()`` and the DataFusion
Display rendering (``Expr(x + Int64(1))``).  Here the IR is a small Python
AST with three renderers:

- ``display()``  — DataFusion-style Display (for ``repr``)
- ``to_sql()``   — ANSI/Spark SQL (used by the aggregate path, which routes
                   through the engine's SQL front door and its
                   ``ST_*_Agg`` rewrites)
- ``to_spark()`` — a native PySpark Column (the execution path for
                   select / filter / sort / join / mutate)
"""

from __future__ import annotations

from typing import Any, Iterable, Optional

from pyspark.sql import functions as F


# DataFusion operator precedence (sqlparser-rs): only the relative order
# matters for Display parenthesization.
_PRECEDENCE = {
    "OR": 5,
    "AND": 10,
    "=": 20, "!=": 20, "<": 20, "<=": 20, ">": 20, ">=": 20,
    "+": 40, "-": 40,
    "*": 45, "/": 45, "%": 45,
}

# Arrow type -> (DataFusion DataType Debug name, Spark SQL type name)
_ARROW_TYPE_NAMES = {
    "int8": ("Int8", "tinyint"),
    "int16": ("Int16", "smallint"),
    "int32": ("Int32", "int"),
    "int64": ("Int64", "bigint"),
    "uint8": ("UInt8", "smallint"),
    "uint16": ("UInt16", "int"),
    "uint32": ("UInt32", "bigint"),
    "uint64": ("UInt64", "bigint"),
    "halffloat": ("Float16", "float"),
    "float": ("Float32", "float"),
    "double": ("Float64", "double"),
    "string": ("Utf8", "string"),
    "large_string": ("LargeUtf8", "string"),
    "binary": ("Binary", "binary"),
    "large_binary": ("LargeBinary", "binary"),
    "bool": ("Boolean", "boolean"),
    "date32[day]": ("Date32", "date"),
    "date64[ms]": ("Date64", "timestamp"),
    "null": ("Null", "void"),
}


def _scalar_display(value: Any) -> str:
    """DataFusion ScalarValue Display: Int64(1), Float64(5),
    Utf8("abc"), Boolean(true), NULL."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return f"Boolean({'true' if value else 'false'})"
    if isinstance(value, int):
        return f"Int64({value})"
    if isinstance(value, float):
        # Rust Display for f64 drops the trailing ".0" on integral values
        if value == int(value) and abs(value) < 1e16:
            return f"Float64({int(value)})"
        return f"Float64({value!r})"
    if isinstance(value, str):
        return f'Utf8("{value}")'
    if isinstance(value, (bytes, bytearray)):
        return f"Binary({','.join(str(b) for b in bytes(value))})"
    return repr(value)


def _scalar_sql(value: Any) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, int):
        return str(value)
    if isinstance(value, float):
        return repr(value)
    if isinstance(value, str):
        return "'" + value.replace("'", "''") + "'"
    if isinstance(value, (bytes, bytearray)):
        return "X'" + bytes(value).hex() + "'"
    raise TypeError(f"cannot render literal of type {type(value).__name__} as SQL")


def _quote_ident(name: str) -> str:
    if name.isidentifier():
        return name
    return "`" + name.replace("`", "``") + "`"


class InternalExpr:
    """Base AST node.  Subclasses set ``_variant`` to the DataFusion
    logical-Expr variant name the reference's tests pin."""

    _variant = "Unknown"

    def variant_name(self) -> str:
        return self._variant

    # precedence used for Display parenthesization; non-binary nodes are
    # atoms (never parenthesized by a parent)
    precedence = 100

    def display(self) -> str:
        raise NotImplementedError

    def to_sql(self) -> str:
        raise NotImplementedError

    def to_spark(self):
        raise NotImplementedError

    def _child_display(self, child: "InternalExpr") -> str:
        s = child.display()
        if child.precedence < self.precedence:
            return f"({s})"
        return s

    def _child_sql(self, child: "InternalExpr") -> str:
        s = child.to_sql()
        if child.precedence < self.precedence:
            return f"({s})"
        return s


class ColumnNode(InternalExpr):
    _variant = "Column"

    def __init__(self, name: str, qualifier: Optional[str] = None, source=None):
        self.name = name
        self.qualifier = qualifier
        self.source = source  # the Spark DataFrame the column was taken from

    def display(self) -> str:
        if self.qualifier:
            return f"{self.qualifier}.{self.name}"
        return self.name

    def to_sql(self) -> str:
        return _quote_ident(self.name)

    def to_spark(self):
        if self.source is not None:
            return self.source[self.name]
        return F.col(self.name)


class LiteralNode(InternalExpr):
    _variant = "Literal"

    def __init__(self, value: Any):
        self.value = value

    def _val(self):
        # container literals (Series / 1x1 frames / arrow arrays) resolve
        # on first use so their validation errors surface lazily, as the
        # reference's pa.array(lit(...)) contract pins
        if isinstance(self.value, _DeferredScalar):
            scalar, _ = _resolve_literal_value(self.value.obj)
            self.value = scalar
        return self.value

    def display(self) -> str:
        return _scalar_display(self._val())

    def to_sql(self) -> str:
        return _scalar_sql(self._val())

    def to_spark(self):
        v = self._val()
        if isinstance(v, int) and not isinstance(v, bool):
            # python ints are Int64 literals (PySpark would infer int32
            # for small values; DataFusion — and the reference's pinned
            # dtypes — use 64-bit)
            return F.lit(v).cast("bigint")
        return F.lit(v)


class AliasNode(InternalExpr):
    _variant = "Alias"

    def __init__(self, child: InternalExpr, name: str):
        self.child = child
        self.name = name

    def display(self) -> str:
        return f"{self.child.display()} AS {self.name}"

    def to_sql(self) -> str:
        return f"{self.child.to_sql()} AS {_quote_ident(self.name)}"

    def to_spark(self):
        return self.child.to_spark().alias(self.name)

    def output_name(self) -> str:
        return self.name


class BinaryNode(InternalExpr):
    _variant = "BinaryExpr"

    def __init__(self, op: str, left: InternalExpr, right: InternalExpr):
        self.op = op
        self.left = left
        self.right = right
        self.precedence = _PRECEDENCE[op]

    def display(self) -> str:
        return (f"{self._child_display(self.left)} {self.op} "
                f"{self._child_display(self.right)}")

    def to_sql(self) -> str:
        return (f"{self._child_sql(self.left)} {self.op} "
                f"{self._child_sql(self.right)}")

    def to_spark(self):
        le, r = self.left.to_spark(), self.right.to_spark()
        return {
            "+": lambda: le + r, "-": lambda: le - r,
            "*": lambda: le * r, "/": lambda: le / r,
            "%": lambda: le % r,
            "=": lambda: le == r, "!=": lambda: le != r,
            "<": lambda: le < r, "<=": lambda: le <= r,
            ">": lambda: le > r, ">=": lambda: le >= r,
            "AND": lambda: le & r, "OR": lambda: le | r,
        }[self.op]()


class IsNullNode(InternalExpr):
    _variant = "IsNull"

    def __init__(self, child: InternalExpr):
        self.child = child

    def display(self) -> str:
        return f"{self.child.display()} IS NULL"

    def to_sql(self) -> str:
        return f"{self._child_sql(self.child)} IS NULL"

    def to_spark(self):
        return self.child.to_spark().isNull()


class IsNotNullNode(InternalExpr):
    _variant = "IsNotNull"

    def __init__(self, child: InternalExpr):
        self.child = child

    def display(self) -> str:
        return f"{self.child.display()} IS NOT NULL"

    def to_sql(self) -> str:
        return f"{self._child_sql(self.child)} IS NOT NULL"

    def to_spark(self):
        return self.child.to_spark().isNotNull()


class InListNode(InternalExpr):
    _variant = "InList"

    def __init__(self, child: InternalExpr, values: list[InternalExpr]):
        self.child = child
        self.values = values

    def display(self) -> str:
        inner = ", ".join(v.display() for v in self.values)
        return f"{self.child.display()} IN ([{inner}])"

    def to_sql(self) -> str:
        inner = ", ".join(v.to_sql() for v in self.values)
        return f"{self._child_sql(self.child)} IN ({inner})"

    def to_spark(self):
        c = self.child.to_spark()
        if all(isinstance(v, LiteralNode) for v in self.values):
            return c.isin(*[v.value for v in self.values])
        out = None
        for v in self.values:
            eq = c == v.to_spark()
            out = eq if out is None else (out | eq)
        return out if out is not None else F.lit(False)


class NegativeNode(InternalExpr):
    _variant = "Negative"

    def __init__(self, child: InternalExpr):
        self.child = child

    def display(self) -> str:
        return f"(- {self.child.display()})"

    def to_sql(self) -> str:
        return f"(- {self._child_sql(self.child)})"

    def to_spark(self):
        return -self.child.to_spark()


class NotNode(InternalExpr):
    _variant = "Not"

    def __init__(self, child: InternalExpr):
        self.child = child

    def display(self) -> str:
        return f"NOT {self.child.display()}"

    def to_sql(self) -> str:
        return f"NOT ({self.child.to_sql()})"

    def to_spark(self):
        return ~self.child.to_spark()


class CastNode(InternalExpr):
    _variant = "Cast"

    def __init__(self, child: InternalExpr, arrow_name: str, spark_name: str):
        self.child = child
        self.arrow_name = arrow_name
        self.spark_name = spark_name

    def display(self) -> str:
        return f"CAST({self.child.display()} AS {self.arrow_name})"

    def to_sql(self) -> str:
        return f"CAST({self.child.to_sql()} AS {self.spark_name.upper()})"

    def to_spark(self):
        return self.child.to_spark().cast(self.spark_name)


class FunctionNode(InternalExpr):
    """Scalar or aggregate function call; ``name`` is the canonical
    (registry-resolved) lowercase name, which is also how DataFusion
    displays alias calls (st_geomfromtext renders as st_geomfromwkt)."""

    def __init__(self, name: str, args: list[InternalExpr],
                 aggregate: bool = False):
        self.name = name
        self.args = args
        self.aggregate = aggregate
        self._variant = "AggregateFunction" if aggregate else "ScalarFunction"

    def display(self) -> str:
        return f"{self.name}({', '.join(a.display() for a in self.args)})"

    def to_sql(self) -> str:
        return f"{self.name}({', '.join(a.to_sql() for a in self.args)})"

    def to_spark(self):
        return F.call_function(self.name, *[a.to_spark() for a in self.args])


class FieldAccessNode(InternalExpr):
    """array index (0-based), struct field, or map key access."""

    _variant = "FieldAccess"

    def __init__(self, child: InternalExpr, key):
        self.child = child
        self.key = key

    def display(self) -> str:
        return f"{self.child.display()}[{self.key!r}]"

    def to_sql(self) -> str:
        if isinstance(self.key, str):
            return f"{self._child_sql(self.child)}[{_scalar_sql(self.key)}]"
        return f"{self._child_sql(self.child)}[{self.key}]"

    def to_spark(self):
        return self.child.to_spark()[self.key]


class InternalSortExpr:
    """Sort-key handle (child + direction + null placement)."""

    def __init__(self, child: InternalExpr, asc: bool, nulls_first: bool):
        self.child = child
        self.asc = asc
        self.nulls_first = nulls_first

    def display(self) -> str:
        d = "ASC" if self.asc else "DESC"
        n = "NULLS FIRST" if self.nulls_first else "NULLS LAST"
        return f"{self.child.display()} {d} {n}"

    def to_spark(self):
        c = self.child.to_spark()
        if self.asc:
            return c.asc_nulls_first() if self.nulls_first else c.asc_nulls_last()
        return c.desc_nulls_first() if self.nulls_first else c.desc_nulls_last()


def _arrow_type_names(target) -> tuple[str, str]:
    """Map a pyarrow DataType (or Python type / string) to the
    (DataFusion Display, Spark SQL) type-name pair."""
    try:
        import pyarrow as pa
        if isinstance(target, pa.DataType):
            try:
                if isinstance(target, pa.ExtensionType):
                    from sedona_db_spark.api.errors import SedonaError
                    raise SedonaError(
                        f"Cannot cast to Arrow extension type {target}")
            except AttributeError:
                pass
            key = str(target)
            if key in _ARROW_TYPE_NAMES:
                return _ARROW_TYPE_NAMES[key]
            if key.startswith("timestamp"):
                return (f"Timestamp({key})", "timestamp")
            if key.startswith("decimal"):
                return (key.capitalize(), key)
            raise TypeError(f"unsupported cast target {target}")
    except ImportError:
        pass
    if target in (int,):
        return _ARROW_TYPE_NAMES["int64"]
    if target in (float,):
        return _ARROW_TYPE_NAMES["double"]
    if target in (str,):
        return _ARROW_TYPE_NAMES["string"]
    if target in (bool,):
        return _ARROW_TYPE_NAMES["bool"]
    if isinstance(target, str):
        return (target, target)
    raise TypeError(f"unsupported cast target {target!r}")


class Expr:
    """User-facing expression (reference expr/expression.py:42).  Wraps an
    :class:`InternalExpr` handle plus the originating context (needed by
    ``.funcs`` piping)."""

    def __init__(self, impl, ctx=None):
        if not isinstance(impl, InternalExpr):
            raise TypeError(
                "Expr() expects an InternalExpr handle, got "
                f"{type(impl).__name__}")
        self._impl = impl
        self._ctx = ctx

    def __repr__(self) -> str:
        return f"Expr({self._impl.display()})"

    # -- plumbing -------------------------------------------------------
    def _wrap(self, impl: InternalExpr, other: "Expr | None" = None) -> "Expr":
        ctx = self._ctx
        if ctx is None and other is not None:
            ctx = other._ctx
        return Expr(impl, ctx)

    def _output_name(self) -> str:
        impl = self._impl
        if isinstance(impl, AliasNode):
            return impl.name
        if isinstance(impl, ColumnNode):
            return impl.name
        return impl.display()

    @property
    def funcs(self):
        if self._ctx is None:
            raise ValueError(
                "Can't pipe Expr without a context; use con.col(...) "
                "instead of col(...)")
        from sedona_db_spark.api.functions import Functions
        return Functions(self._ctx, self)

    @property
    def geo(self):
        from sedona_db_spark.api.functions import GeoFunctions
        return GeoFunctions(self.funcs)

    @property
    def rst(self):
        from sedona_db_spark.api.functions import RasterFunctions
        return RasterFunctions(self.funcs)

    # -- combinators ----------------------------------------------------
    def alias(self, name: str) -> "Expr":
        return self._wrap(AliasNode(self._impl, name))

    def cast(self, target) -> "Expr":
        arrow_name, spark_name = _arrow_type_names(target)
        return self._wrap(CastNode(self._impl, arrow_name, spark_name))

    def is_null(self) -> "Expr":
        return self._wrap(IsNullNode(self._impl))

    def is_not_null(self) -> "Expr":
        return self._wrap(IsNotNullNode(self._impl))

    def isin(self, values: Iterable[Any]) -> "Expr":
        nodes = [_to_node(v) for v in values]
        return self._wrap(InListNode(self._impl, nodes))

    def negate(self) -> "Expr":
        return self._wrap(NegativeNode(self._impl))

    def asc(self, nulls_first: bool = False) -> "SortExpr":
        return SortExpr(InternalSortExpr(self._impl, True, nulls_first))

    def desc(self, nulls_first: bool = False) -> "SortExpr":
        return SortExpr(InternalSortExpr(self._impl, False, nulls_first))

    # -- operators ------------------------------------------------------
    def _binary(self, op: str, other: Any, reflected: bool = False) -> "Expr":
        other_expr = other if isinstance(other, Expr) else None
        node = _to_node(other)
        if reflected:
            impl = BinaryNode(op, node, self._impl)
        else:
            impl = BinaryNode(op, self._impl, node)
        return self._wrap(impl, other_expr)

    def __add__(self, other): return self._binary("+", other)
    def __radd__(self, other): return self._binary("+", other, True)
    def __sub__(self, other): return self._binary("-", other)
    def __rsub__(self, other): return self._binary("-", other, True)
    def __mul__(self, other): return self._binary("*", other)
    def __rmul__(self, other): return self._binary("*", other, True)
    def __truediv__(self, other): return self._binary("/", other)
    def __rtruediv__(self, other): return self._binary("/", other, True)
    def __mod__(self, other): return self._binary("%", other)
    def __neg__(self): return self.negate()
    def __eq__(self, other): return self._binary("=", other)  # type: ignore[override]
    def __ne__(self, other): return self._binary("!=", other)  # type: ignore[override]
    def __lt__(self, other): return self._binary("<", other)
    def __le__(self, other): return self._binary("<=", other)
    def __gt__(self, other): return self._binary(">", other)
    def __ge__(self, other): return self._binary(">=", other)
    def __and__(self, other): return self._binary("AND", other)
    def __rand__(self, other): return self._binary("AND", other, True)
    def __or__(self, other): return self._binary("OR", other)
    def __ror__(self, other): return self._binary("OR", other, True)
    def __invert__(self): return self._wrap(NotNode(self._impl))

    # __eq__ is overridden to build expressions, so instances must not be
    # hashable (a dict key comparison would silently build an Expr)
    __hash__ = None  # type: ignore[assignment]

    def __bool__(self) -> bool:
        raise TypeError(
            "The truth value of an Expr is ambiguous; use & | ~ instead "
            "of and/or/not, and df.filter(...) to apply predicates")

    def __len__(self) -> int:
        raise TypeError("Expr has no length")

    def __getitem__(self, key) -> "Expr":
        if isinstance(key, bool) or not isinstance(key, (int, str)):
            raise TypeError(
                f"Expr[...] with {type(key).__name__} is not supported; "
                "use an int index or a str field/key name")
        return self._wrap(FieldAccessNode(self._impl, key))


class SortExpr:
    """User-facing sort key (reference expr/expression.py:363)."""

    def __init__(self, impl):
        if not isinstance(impl, InternalSortExpr):
            raise TypeError(
                "SortExpr() expects an InternalSortExpr handle, got "
                f"{type(impl).__name__}")
        self._impl = impl

    def __repr__(self) -> str:
        return f"SortExpr({self._impl.display()})"


def sort_expr(expr: Expr, asc: bool = True,
              nulls_first: bool = False) -> SortExpr:
    if not isinstance(expr, Expr):
        raise TypeError(
            f"sort_expr() expects an Expr, got {type(expr).__name__}")
    return SortExpr(InternalSortExpr(expr._impl, asc, nulls_first))


def col(name: str, qualifier: Optional[str] = None, ctx: Any = None) -> Expr:
    if not isinstance(name, str):
        raise TypeError(f"col() expects a str name, got {type(name).__name__}")
    return Expr(ColumnNode(name, qualifier), ctx)


class _DeferredScalar:
    """Marker for length-1 containers passed to lit(); resolution (and
    its validation errors) happens when the value is first needed, which
    is what the reference's pa.array(lit(...)) tests pin."""

    def __init__(self, obj):
        self.obj = obj


def _resolve_literal_value(obj):
    """Resolve a lit() input to (python_scalar, arrow_array_of_1)."""
    import pyarrow as pa
    try:
        import pandas as pd
    except ImportError:
        pd = None

    from sedona_db_spark.api.dataframe import DataFrame as _DF

    if isinstance(obj, _DF):
        if len(obj.columns) != 1:
            raise ValueError(
                f"Can't create literal from DataFrame with number of "
                f"columns != 1 ({len(obj.columns)})")
        rows = obj._sdf.limit(2).collect()
        if len(rows) != 1:
            raise ValueError(
                f"Can't create literal from DataFrame with size != 1 row "
                f"({len(rows)})")
        v = rows[0][0]
        return v, pa.array([v])
    if pd is not None and isinstance(obj, pd.DataFrame):
        if obj.shape != (1, 1):
            raise ValueError(
                f"Can't create literal from DataFrame with shape != (1, 1) "
                f"({obj.shape})")
        v = obj.iloc[0, 0]
        return _unbox_pandas(v), pa.array(obj.iloc[:, 0])
    if pd is not None and isinstance(obj, pd.Series):
        if len(obj) != 1:
            raise ValueError(
                f"Can't create literal from Series with length != 1 "
                f"({len(obj)})")
        return _unbox_pandas(obj.iloc[0]), pa.Array.from_pandas(obj)
    if isinstance(obj, pa.ChunkedArray):
        obj = obj.combine_chunks()
    if isinstance(obj, pa.Array):
        if len(obj) != 1:
            raise ValueError(
                f"Can't create literal from array with length != 1 "
                f"({len(obj)})")
        return obj[0].as_py(), obj
    if isinstance(obj, pa.Scalar):
        arr = pa.array([obj.as_py()], type=obj.type)
        return obj.as_py(), arr
    # CRS-like objects (pyproj.CRS / geoarrow crs): literal is their
    # PROJJSON string (reference expr/literal.py _resolve_arrow_lit)
    to_json = getattr(obj, "to_json", None)
    if to_json is not None and not isinstance(obj, (str, bytes)):
        try:
            s = to_json()
            if isinstance(s, str):
                return s, pa.array([s])
        except Exception:
            pass
    # plain python scalar
    return obj, pa.array([obj])


def _unbox_pandas(v):
    item = getattr(v, "item", None)
    if item is not None and not isinstance(v, (str, bytes)):
        try:
            return v.item()
        except Exception:
            return v
    return v


class Literal(Expr):
    """User-facing literal (reference expr/literal.py:29).  A Literal is
    an Expr (usable in select/mutate) but a *distinct* class: filter()
    rejects bare literals by type, and ``pa.array(lit(x))`` resolves the
    value through the Arrow PyCapsule protocol."""

    def __init__(self, value: Any, ctx: Any = None):
        self._raw = value
        if isinstance(value, (int, float, str, bool, bytes, type(None))):
            node = LiteralNode(value)
        else:
            node = LiteralNode(_DeferredScalar(value))
        super().__init__(node, ctx)

    def _resolved_node(self) -> LiteralNode:
        node = self._impl
        node._val()
        return node

    def __arrow_c_array__(self, requested_schema=None):
        _, arr = _resolve_literal_value(self._raw)
        return arr.__arrow_c_array__(requested_schema)

    def __repr__(self) -> str:
        return f"Expr({self._resolved_node().display()})"

    @property
    def funcs(self):
        if self._ctx is None:
            raise ValueError(
                "Can't pipe Literal without a context; use con.lit(...) "
                "instead of lit(...)")
        self._resolved_node()
        from sedona_db_spark.api.functions import Functions
        return Functions(self._ctx, self)

    @property
    def geo(self):
        from sedona_db_spark.api.functions import GeoFunctions
        return GeoFunctions(self.funcs)

    @property
    def rst(self):
        from sedona_db_spark.api.functions import RasterFunctions
        return RasterFunctions(self.funcs)


def lit(value: Any, ctx: Any = None) -> Literal:
    return Literal(value, ctx)


def _to_node(value: Any) -> InternalExpr:
    """Coerce an operator/function argument to an AST node."""
    if isinstance(value, Literal):
        return value._resolved_node()
    if isinstance(value, Expr):
        return value._impl
    if isinstance(value, InternalExpr):
        return value
    if isinstance(value, (int, float, str, bool, bytes, type(None))):
        return LiteralNode(value)
    scalar, _ = _resolve_literal_value(value)
    return LiteralNode(scalar)
