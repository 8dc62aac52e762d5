"""The scalar transform library, compiled to Spark Column expressions.

Parity surface: etielle/transforms.py (get, get_from_root, get_from_parent,
key, index, parent_key, parent_index, literal, concat, format_id, coalesce,
len_of, apply, lookup) plus fluent.py's node()/parent_index()/@transform.
Everything except ``apply``/``@transform`` stays JVM-side (no Python UDFs):
``map_column`` is the preferred escape hatch because it composes built-in
pyspark.sql.functions at compile time (whole-stage codegen, vectorized).
"""

from __future__ import annotations

import dataclasses

from typing import Any, Callable, Optional, Sequence, Union

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

from .core import (
    MARKER_FIELDS,
    NULL,
    CompileEnv,
    PathSeg,
    Transform,
    ensure_transform,
    parse_path,
    resolve_path,
    strip_marker_fields,
)

__all__ = [
    "Context",
    "apply_ctx",
    "get",
    "get_from_root",
    "get_from_parent",
    "key",
    "index",
    "parent_key",
    "parent_index",
    "node",
    "literal",
    "concat",
    "format_id",
    "coalesce",
    "len_of",
    "apply",
    "map_column",
    "lookup",
    "transform",
]


def get(path: Union[str, Sequence[PathSeg]]) -> Transform:
    """Path relative to the current node (etielle/transforms.py:83-114)."""
    segs = parse_path(path)

    def _c(env: CompileEnv):
        cur = env.current
        return resolve_path(cur.node, cur.dtype, segs)

    return Transform(_c)


def get_from_root(path: Union[str, Sequence[PathSeg]]) -> Transform:
    """Path resolved from the JSON root (etielle/transforms.py:117-128)."""
    segs = parse_path(path)

    def _c(env: CompileEnv):
        root = env.levels[0]
        return resolve_path(root.node, root.dtype, segs)

    return Transform(_c)


def get_from_parent(path: Union[str, Sequence[PathSeg]] = "", depth: int = 1) -> Transform:
    """Path from the ancestor node ``depth`` levels up
    (etielle/transforms.py:131-148); exceeding the chain yields NULL."""
    segs = parse_path(path)

    def _c(env: CompileEnv):
        anc = env.ancestor(depth)
        if anc is None:
            return F.lit(None), NULL
        return resolve_path(anc.node, anc.dtype, segs)

    return Transform(_c)


def key() -> Transform:
    """Current dict-iteration key, stringified (etielle/transforms.py:69-73)."""

    def _c(env: CompileEnv):
        cur = env.current
        if cur.key is None:
            return F.lit(None), NULL
        return cur.key.cast("string"), T.StringType()

    return Transform(_c)


def index() -> Transform:
    """Current list-iteration index (etielle/transforms.py:76-80).

    Dict iteration exposes ``key()``, not ``index()`` (reference Context
    keeps them mutually exclusive).
    """

    def _c(env: CompileEnv):
        cur = env.current
        if cur.variant:
            # per-row dispatch: array rows (no key) expose the index
            return F.when(cur.key.isNull(), cur.pos), T.LongType()
        if cur.pos is None or cur.key is not None:
            return F.lit(None), NULL
        return cur.pos, T.IntegerType()

    return Transform(_c)


def parent_key(depth: int = 1) -> Transform:
    """Ancestor's dict key (etielle/transforms.py:151-158)."""

    def _c(env: CompileEnv):
        anc = env.ancestor(depth)
        if anc is None or anc.key is None:
            return F.lit(None), NULL
        return anc.key.cast("string"), T.StringType()

    return Transform(_c)


def parent_index(depth: int = 1) -> Transform:
    """Ancestor's list index (etielle/fluent.py:138-161)."""

    def _c(env: CompileEnv):
        anc = env.ancestor(depth)
        if anc is None:
            return F.lit(None), NULL
        if anc.variant:
            return F.when(anc.key.isNull(), anc.pos), T.LongType()
        if anc.pos is None or anc.key is not None:
            return F.lit(None), NULL
        return anc.pos, T.IntegerType()

    return Transform(_c)


def node() -> Transform:
    """The current node value itself (etielle/fluent.py:122-135)."""

    def _c(env: CompileEnv):
        cur = env.current
        return cur.node, cur.dtype

    return Transform(_c)


def literal(value: Any) -> Transform:
    """Constant (etielle/transforms.py:55-66)."""
    return ensure_transform(value)


def concat(*parts: Any) -> Transform:
    """Stringify each part (None -> ""), concatenate
    (etielle/transforms.py:173-180)."""
    ts = [ensure_transform(p) for p in parts]

    def _c(env: CompileEnv):
        cols = [F.coalesce(t.compile(env).cast("string"), F.lit("")) for t in ts]
        return F.concat(*cols), T.StringType()

    return Transform(_c)


def format_id(*parts: Any, sep: str = "_") -> Transform:
    """Join stringified parts skipping None and "" (transforms.py:183-192)."""
    ts = [ensure_transform(p) for p in parts]

    def _c(env: CompileEnv):
        cols = []
        for t in ts:
            c = t.compile(env).cast("string")
            # concat_ws skips NULLs but not empty strings; map "" -> NULL
            cols.append(F.when(c.isNotNull() & (c != F.lit("")), c))
        return F.concat_ws(sep, *cols), T.StringType()

    return Transform(_c)


def coalesce(*inners: Any) -> Transform:
    """First non-None result (etielle/transforms.py:195-203)."""
    ts = [ensure_transform(t) for t in inners]

    def _c(env: CompileEnv):
        compiled = [t.compile_typed(env) for t in ts]
        dtype = next(
            (d for _, d in compiled if d is not None and not isinstance(d, T.NullType)),
            None,
        )
        return F.coalesce(*[c for c, _ in compiled]), dtype

    return Transform(_c)


def len_of(inner: Transform) -> Transform:
    """Length of list/dict/str else None (etielle/transforms.py:161-170)."""

    def _c(env: CompileEnv):
        col, dtype = inner.compile_typed(env)
        if isinstance(dtype, (T.ArrayType, T.MapType)):
            # size(NULL) is -1 under legacy non-ANSI semantics; the
            # reference returns None for None containers
            return (
                F.when(col.isNotNull(), F.size(col)).cast("int"),
                T.IntegerType(),
            )
        if isinstance(dtype, T.StructType):
            if any(f.name == "__keys__" for f in dtype.fields):
                # in-memory dict: __keys__ is the row's own key list, so
                # this is the exact per-row len(dict); NULL __keys__ means
                # an {} sibling -> 0.  (size(NULL) is -1 under legacy
                # semantics, hence the explicit branch.)
                keys = col.getField("__keys__")
                cnt = F.when(keys.isNotNull(), F.size(keys)).otherwise(F.lit(0))
                return F.when(col.isNotNull(), cnt).cast("int"), T.IntegerType()
            # DataFrame-root struct: the schema is the shape; markers are
            # not entries (len_of({}) == 0, not 1)
            n = len([f for f in dtype.fields if f.name not in MARKER_FIELDS])
            return F.when(col.isNotNull(), F.lit(n)), T.IntegerType()
        if isinstance(dtype, T.VariantType):
            # per-row kind dispatch, mirroring Python len(): arrays and
            # dicts count entries, strings count characters, everything
            # else (numbers, booleans, null) has no len -> NULL
            kind = F.schema_of_variant(col)
            arr = col.try_cast("array<variant>")
            obj = col.try_cast("map<string, variant>")
            return (
                F.when(kind.startswith("ARRAY"), F.size(arr))
                .when(kind.startswith("OBJECT"), F.size(obj))
                .when(
                    kind == F.lit("STRING"),
                    F.length(F.try_variant_get(col, "$", "string")),
                )
                .cast("int"),
                T.IntegerType(),
            )
        if isinstance(dtype, T.StringType) or dtype is None:
            return F.length(col.cast("string")).cast("int"), T.IntegerType()
        return F.lit(None), NULL

    return Transform(_c)


def map_column(
    fn: Callable[..., Column],
    *inners: Any,
    dtype: Optional[T.DataType] = None,
) -> Transform:
    """JVM-side escape hatch: apply a Column->Column function at compile
    time, e.g. ``map_column(F.upper, get("name"))`` or
    ``map_column(lambda a, b: a + b, get("x"), get("y"))``.

    This replaces most uses of the reference's ``apply`` without leaving
    whole-stage codegen.
    """
    ts = [ensure_transform(t) for t in inners]

    def _c(env: CompileEnv):
        cols = []
        for t in ts:
            col, dt_in = t.compile_typed(env)
            if dt_in is not None:
                # user lambdas must not see serialization markers (same
                # hygiene as apply())
                col, _ = strip_marker_fields(col, dt_in)
            cols.append(col)
        return fn(*cols), dtype

    return Transform(_c)


def apply(
    func: Callable[[Any], Any],
    inner: Any,
    *,
    return_type: Union[str, T.DataType] = "string",
) -> Transform:
    """Arbitrary Python function over a transform's result
    (etielle/transforms.py:206-212).

    Row-at-a-time Python UDF — the slow path.  ``return_type`` must be
    declared (the reference is dynamically typed; Spark is not).  Prefer
    ``map_column`` with built-in functions wherever possible.
    """
    inner_t = ensure_transform(inner)
    udf = F.udf(func, return_type)

    def _c(env: CompileEnv):
        col, dt_in = inner_t.compile_typed(env)
        if dt_in is not None:
            # a Python UDF sees the value as a Row; serialization markers
            # must not leak into user code
            col, _ = strip_marker_fields(col, dt_in)
        dt = return_type if isinstance(return_type, T.DataType) else None
        return udf(col), dt

    return Transform(_c)


def _lit_type(v: Any) -> T.DataType:
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    return T.StringType()


# -- lookup: Python-value schema inference for index values -----------------


def _infer_py_type(v: Any) -> T.DataType:
    import datetime
    import decimal

    if v is None:
        return T.NullType()
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    if isinstance(v, datetime.datetime):
        return T.TimestampType()
    if isinstance(v, datetime.date):
        return T.DateType()
    if isinstance(v, decimal.Decimal):
        return T.DoubleType()
    if isinstance(v, (bytes, bytearray)):
        return T.BinaryType()
    if isinstance(v, dict):
        return T.StructType(
            [T.StructField(str(k), _infer_py_type(x), True) for k, x in v.items()]
        )
    if isinstance(v, (list, tuple)):
        t: T.DataType = T.NullType()
        for x in v:
            t = _merge_py_types(t, _infer_py_type(x))
        return T.ArrayType(t, True)
    return T.StringType()


_NUM_RANK = {T.BooleanType: 0, T.LongType: 1, T.DoubleType: 2}


def _merge_py_types(a: T.DataType, b: T.DataType) -> T.DataType:
    if isinstance(a, T.NullType):
        return b
    if isinstance(b, T.NullType):
        return a
    if a == b:
        return a
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        fields: dict[str, T.DataType] = {}
        order: list[str] = []
        for st in (a, b):
            for f in st.fields:
                if f.name not in fields:
                    fields[f.name] = f.dataType
                    order.append(f.name)
                else:
                    fields[f.name] = _merge_py_types(fields[f.name], f.dataType)
        return T.StructType([T.StructField(n, fields[n], True) for n in order])
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(_merge_py_types(a.elementType, b.elementType), True)
    # numerics widen (bool < long < double — Python's numeric tower, where
    # True == 1; a bool value in a long column reads as 0/1)
    if type(a) in _NUM_RANK and type(b) in _NUM_RANK:
        return max(a, b, key=lambda t: _NUM_RANK[type(t)])
    if isinstance(a, (T.DateType, T.TimestampType)) and isinstance(
        b, (T.DateType, T.TimestampType)
    ):
        return T.TimestampType()
    return T.StringType()


_LOOKUP_MAX_ENTRIES = 10_000


def _values_array(values: list, vtype: T.DataType) -> tuple[Column, T.DataType]:
    """Array column of index values.  Scalar values ship as typed lits
    (handles date/datetime/Decimal natively); container values ship as
    ONE JSON literal decoded by from_json (non-JSON scalars inside fall
    back to their str form, which the target type parses back)."""
    if isinstance(vtype, T.NullType):
        return F.array(*[F.lit(None).cast("string") for _ in values]), T.StringType()
    if any(isinstance(v, (dict, list, tuple)) for v in values):
        import json as _json

        return (
            F.from_json(
                F.lit(_json.dumps(values, default=str)), T.ArrayType(vtype, True)
            ),
            vtype,
        )
    return F.array(*[F.lit(v).cast(vtype) for v in values]), vtype


def lookup(index_name: str, key_transform: Transform, *, default: Any = None) -> Transform:
    """Probe a named index (etielle/transforms.py:215-248).

    Compiled as a map-literal probe, i.e. the index ships with the plan to
    every executor exactly like a broadcast hash-join build side.  Missing
    index name raises at compile time (reference raises ValueError at row
    time); missing key yields ``default``.

    Keys match with Python dict equality: the index splits into a
    string-keyed and a number-keyed map (1 == 1.0 == True per Python's
    numeric tower) and the probe's STATIC type picks which one to search,
    so '1' never matches 1 and no lossy string formatting is involved.
    An untyped probe searches the string map (documented coercion).
    Values may be arbitrary structures (``build_index(value=node())``).
    Indices above the entry cap raise at compile time — an unbounded
    index belongs in ``link_to`` (a real join), not in the plan.
    """

    def _c(env: CompileEnv):
        import decimal

        if index_name not in env.indices:
            available = list(env.indices.keys())
            raise ValueError(
                f"Index '{index_name}' not found. Available indices: {available}"
            )
        mapping = env.indices[index_name]
        if len(mapping) > _LOOKUP_MAX_ENTRIES:
            raise ValueError(
                f"lookup('{index_name}'): index has {len(mapping)} entries "
                f"(> {_LOOKUP_MAX_ENTRIES}); a map literal this large would "
                "bloat the plan shipped to every task — model it as a table "
                "and use link_to (a broadcast join) instead"
            )
        kcol, ktype = key_transform.compile_typed(env)
        if not mapping:
            return (F.lit(default), _lit_type(default)) if default is not None else (F.lit(None), NULL)

        vtype: T.DataType = T.NullType()
        for v in mapping.values():
            vtype = _merge_py_types(vtype, _infer_py_type(v))

        # split keys by kind: Python dict equality crosses numeric
        # representations but never number<->string
        str_keys: dict[str, Any] = {}
        num_keys: dict[float, Any] = {}
        none_entry: tuple = ()
        for k, v in mapping.items():
            if k is None:
                none_entry = (v,)
            elif isinstance(k, (bool, int, float, decimal.Decimal)):
                num_keys[float(k)] = v
            else:
                str_keys[str(k)] = v

        numeric_probe = isinstance(
            ktype,
            (
                T.BooleanType,
                T.ByteType,
                T.ShortType,
                T.IntegerType,
                T.LongType,
                T.FloatType,
                T.DoubleType,
                T.DecimalType,
            ),
        )
        dflt = (
            F.lit(default)
            if default is not None
            else F.lit(None).cast(
                vtype if not isinstance(vtype, T.NullType) else "string"
            )
        )
        def probe_map(kmap: dict, key_expr: Column) -> Column:
            if not kmap:
                return dflt
            vals_arr, _vt = _values_array(list(kmap.values()), vtype)
            m = F.map_from_arrays(
                F.array(*[F.lit(k) for k in kmap.keys()]), vals_arr
            )
            got = F.try_element_at(m, key_expr)
            # the default applies only when the KEY is absent; a stored
            # None value stays None (reference: dict.get semantics,
            # transforms.py:236-247)
            return F.when(F.map_contains_key(m, key_expr), got).otherwise(dflt)

        if isinstance(ktype, T.VariantType):
            # string/number-mixed probe (kind-mixed field): dispatch PER
            # ROW on the variant's actual kind — Python dict equality
            # never crosses the number/string boundary, so a row holding
            # 7 searches the numeric keys and a row holding '7' the
            # string keys
            kind = F.schema_of_variant(kcol)
            is_num = kind.isin("BIGINT", "INT", "SMALLINT", "TINYINT",
                               "DOUBLE", "FLOAT", "BOOLEAN") | kind.startswith(
                "DECIMAL"
            )
            probe = (
                F.when(
                    kind == F.lit("STRING"),
                    probe_map(
                        str_keys, F.try_variant_get(kcol, "$", "string")
                    ),
                )
                .when(
                    is_num,
                    probe_map(
                        num_keys, F.try_variant_get(kcol, "$", "double")
                    ),
                )
                .otherwise(dflt)
            )
        elif numeric_probe:
            probe = probe_map(num_keys, kcol.cast("double"))
        else:
            probe = probe_map(str_keys, kcol.cast("string"))
        if none_entry:
            none_val, _ = _values_array(list(none_entry), vtype)
            probe = F.when(kcol.isNull(), F.element_at(none_val, F.lit(1))).otherwise(
                probe
            )
        else:
            probe = F.when(kcol.isNull(), dflt).otherwise(probe)
        out_t = vtype if default is None and not isinstance(vtype, T.NullType) else None
        return probe, out_t

    return Transform(_c)


def transform(func: Callable) -> Callable[..., Transform]:
    """Decorator for user-defined transforms (etielle/fluent.py:82-119).

    The reference passes a per-row ``Context`` first; here the function
    receives the current *node value* (plus curried args) and runs as a
    Python UDF.  Declare the Spark return type via ``returns=``:

        @transform
        def shout(value, suffix="!"):
            return str(value).upper() + suffix

        .map_to(..., fields=[Field("loud", shout(suffix="?!", returns="string"))])
    """

    def factory(
        *args: Any,
        returns: Union[str, T.DataType] = "string",
        context: bool = False,
        **kwargs: Any,
    ) -> Transform:
        if context:
            # reference-parity signature: func(ctx, *args) with the full
            # Context chain (see apply_ctx)
            return apply_ctx(
                lambda ctx: func(ctx, *args, **kwargs), return_type=returns
            )

        def fn(value: Any) -> Any:
            return func(value, *args, **kwargs)

        return apply(fn, node(), return_type=returns)

    return factory


@dataclasses.dataclass
class Context:
    """Reference-parity per-row traversal context (reference
    core.py:28-51), materialized ONLY inside context-aware UDFs
    (``apply(..., with_context=True)`` / ``@transform`` with
    ``context=True``).

    The compiled engine has no per-row context objects — transforms are
    Column expressions — so this chain is synthesized from the traversal
    level columns at UDF call time: ``node`` / ``key`` / ``index`` per
    level, ``parent`` walking outward, ``root`` at the top.  ``path`` is
    not reconstructed (the static path is compile-time information;
    ``slots`` likewise has no analog) — both documented divergences.
    """

    root: Any
    node: Any
    parent: Optional["Context"]
    key: Optional[str]
    index: Optional[int]


def _context_col(env: CompileEnv) -> Column:
    """One struct column carrying every traversal level's
    (node, key, index) — the raw material for rebuilding the Context
    chain inside the UDF."""
    entries = []
    for d, lvl in enumerate(env.levels):
        node_col = lvl.node
        if lvl.dtype is not None:
            node_col, _ = strip_marker_fields(node_col, lvl.dtype)
        key_col = (
            lvl.key.cast("string")
            if lvl.key is not None
            else F.lit(None).cast("string")
        )
        idx_col = (
            lvl.pos.cast("int")
            if (lvl.pos is not None and lvl.key is None)
            else F.lit(None).cast("int")
        )
        entries.append(
            F.struct(
                node_col.alias("node"),
                key_col.alias("key"),
                idx_col.alias("index"),
            ).alias(f"l{d}")
        )
    return F.struct(*entries)


def _rebuild_context(packed: Any) -> Context:
    from .fluent import _plain_py

    levels = [packed[f"l{d}"] for d in range(len(packed.__fields__))]
    root_val = _plain_py(levels[0]["node"])
    ctx: Optional[Context] = None
    for lvl in levels:
        ctx = Context(
            root=root_val,
            node=_plain_py(lvl["node"]),
            parent=ctx,
            key=lvl["key"],
            index=lvl["index"],
        )
    assert ctx is not None
    return ctx


def apply_ctx(
    func: Callable[[Context], Any],
    *,
    return_type: Union[str, T.DataType] = "string",
) -> Transform:
    """Context-aware ``apply`` (reference transforms.py:206-212 with the
    full Context signature): the UDF receives a :class:`Context` chain —
    ``ctx.node`` / ``ctx.key`` / ``ctx.index`` / ``ctx.parent`` /
    ``ctx.root`` — exactly like a reference transform.  Strictly the
    slow path: the context struct rides through Arrow per row; prefer
    ``get`` / ``key`` / ``map_column`` compositions wherever possible.
    """

    def _c(env: CompileEnv):
        udf = F.udf(lambda packed: func(_rebuild_context(packed)), return_type)
        dt = return_type if isinstance(return_type, T.DataType) else None
        return udf(_context_col(env)), dt

    return Transform(_c)
