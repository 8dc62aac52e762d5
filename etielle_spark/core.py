"""Compile-time core: transforms as Column factories, fields, traversal env.

The reference engine (etielle) interprets ``Transform = Callable[[Context], T]``
per row (etielle/core.py:28-62).  Here a Transform *compiles* to a
``pyspark.sql.Column`` against a :class:`CompileEnv` that describes the
traversal state (one entry per ``each()`` level: the exploded node column,
its dict key / list index columns, and the node's Spark ``DataType``).  The
whole pipeline therefore becomes a declarative DataFrame plan that Catalyst
optimizes; no per-row Python runs unless the user reaches for ``apply``.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Callable, Optional, Sequence, Union

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

PathSeg = Union[str, int]


def parse_path(path: Union[str, Sequence[PathSeg], None]) -> list[PathSeg]:
    """Dot-notation path to segments; all-digit segments become ints.

    Mirrors reference semantics at etielle/transforms.py:88-94.
    """
    if path is None:
        return []
    if isinstance(path, str):
        return [int(s) if s.isdigit() else s for s in path.split(".") if s != ""]
    return list(path)


NULL = T.NullType()


def resolve_path(col: Column, dtype: T.DataType, segments: Sequence[PathSeg]):
    """Navigate ``segments`` from a (column, dtype) pair.

    Missing struct fields, wrong-typed access and out-of-bounds indices all
    yield a NULL column (reference: etielle/transforms.py:95-114 returns
    None in those cases).  Returns ``(Column, DataType)``.
    """
    for seg in segments:
        if isinstance(dtype, T.StructType):
            names = {f.name: f for f in dtype.fields}
            seg_s = str(seg)
            if seg_s in names:
                col = col.getField(seg_s)
                dtype = names[seg_s].dataType
            else:
                return F.lit(None), NULL
        elif isinstance(dtype, T.ArrayType):
            if isinstance(seg, int):
                idx = seg + 1 if seg >= 0 else seg
                col = F.try_element_at(col, F.lit(idx))
                dtype = dtype.elementType
            else:
                return F.lit(None), NULL
        elif isinstance(dtype, T.MapType):
            key = F.lit(seg).cast(dtype.keyType)
            col = F.try_element_at(col, key)
            dtype = dtype.valueType
        else:
            return F.lit(None), NULL
    return col, dtype


@dataclass
class LevelEnv:
    """One ``each()`` level: the exploded element and its provenance."""

    node: Column
    dtype: T.DataType
    key: Optional[Column] = None  # dict-iteration key (string) or None
    pos: Optional[Column] = None  # list/dict-entry position or None


@dataclass
class CompileEnv:
    """Traversal environment visible to transforms during compilation.

    ``levels[0]`` is the root context; ``levels[-1]`` the current node
    (reference Context chain: etielle/core.py:28-51).
    """

    levels: list[LevelEnv]
    indices: dict[str, dict] = dc_field(default_factory=dict)

    @property
    def current(self) -> LevelEnv:
        return self.levels[-1]

    def ancestor(self, depth: int) -> Optional[LevelEnv]:
        i = len(self.levels) - 1 - depth
        if i < 0:
            return None
        return self.levels[i]


class Transform:
    """A composable column-expression factory.

    ``compile_typed(env) -> (Column, DataType | None)``; dtype is tracked
    for path navigation and ``len_of`` dispatch, ``None`` when unknown.
    """

    def __init__(self, fn: Callable[[CompileEnv], tuple[Column, Optional[T.DataType]]]):
        self._fn = fn

    def compile_typed(self, env: CompileEnv) -> tuple[Column, Optional[T.DataType]]:
        return self._fn(env)

    def compile(self, env: CompileEnv) -> Column:
        return self._fn(env)[0]


def ensure_transform(value: Any) -> Transform:
    """Literal auto-wrap, as the reference does for plain values
    (etielle/transforms.py:55-66)."""
    if isinstance(value, Transform):
        return value
    return Transform(lambda env, v=value: (F.lit(v), None))


@dataclass(frozen=True)
class Field:
    """Named output column (reference: etielle/fluent.py:44-57)."""

    name: str
    transform: Transform
    merge: Optional[object] = None  # MergePolicy from policies.py

    @property
    def is_temp(self) -> bool:
        return False


@dataclass(frozen=True)
class TempField:
    """Join/link-only column, dropped from output
    (reference: etielle/fluent.py:59-76)."""

    name: str
    transform: Transform
    merge: Optional[object] = None

    @property
    def is_temp(self) -> bool:
        return True
