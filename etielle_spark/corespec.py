"""Core-API (plan-level) specs: the reference's declarative IR —
``MappingSpec`` / ``TraversalSpec`` / ``TableEmit`` / ``IterationLevel``
— plus ``run_mapping`` to execute one (reference core.py:155-249,
executor.py:217-437).

Reference power users build these dataclasses directly instead of
chaining the fluent builder; here they compile onto the same
:class:`~etielle_spark.fluent.PipelineBuilder`, so both API levels share
one engine.  Structural divergences from the reference, forced by the
distributed engine and documented here once:

- ``MappingResult``'s per-key instance dict becomes a
  :class:`~etielle_spark.fluent.PipelineResult` of DataFrames
  (``.rows()`` / ``.instances()`` recover driver-side objects);
- ``Context`` (the reference's per-node traversal handle,
  core.py:28-71) exists only inside context-aware UDFs — transforms
  compile to Column expressions against
  :class:`~etielle_spark.core.CompileEnv`, and
  :func:`~etielle_spark.transforms.apply_ctx` materializes the
  node/key/index/parent/root chain for the rows that need it;
- ``FlushContext`` (chunking.py:236-256, a SQLAlchemy-session flush
  bundle) and ``MappingRuntimeState`` (executor.py:13-16, cross-root
  auto-key counters) are interpreter internals: flushing here is
  ``FlushStrategy.flush(store, name, df, keys)`` over DataFrames, and
  auto-keys are a synthesized arrival-order column.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Union

from .core import Field, TempField, Transform
from .fluent import PipelineResult, etl

# The reference's legacy core-level Field (core.py:155-158) is the same
# (name, transform) pair as the fluent Field here.
CoreField = Field
# Instance-level field spec (reference instances.py:135-140) — identical
# shape at this engine's level.
FieldSpec = Field
# The unified mapping result (reference core.py:239-249): this engine's
# result object IS the mapping result — tables as DataFrames, with
# ``.rows()`` / ``.instances()`` recovering per-key driver-side payloads.
from .fluent import PipelineResult as MappingResult  # noqa: E402

__all__ = [
    "CoreField",
    "MappingResult",
    "FieldSpec",
    "IterationLevel",
    "TableEmit",
    "InstanceEmit",
    "TraversalSpec",
    "MappingSpec",
    "run_mapping",
]


@dataclass(frozen=True)
class IterationLevel:
    """One ``.each()`` level: path segments to navigate, then how to
    iterate (reference core.py:176-186)."""

    path: Sequence[str] = ()
    mode: str = "auto"  # auto | items | single


@dataclass(frozen=True)
class TableEmit:
    """Rows for one table from a traversal position (reference
    core.py:161-173).  ``join_keys`` transforms compute the composite
    merge key; emitted as temp columns, so they never appear in the
    output unless also named in ``fields``."""

    table: str
    fields: Sequence[Union[Field, TempField]]
    join_keys: Sequence[Transform] = ()


@dataclass(frozen=True)
class InstanceEmit:
    """Typed-instance variant of :class:`TableEmit` (reference
    instances.py:142-186): ``table`` is a model class (dataclass /
    TypedDict / pydantic / SQLModel) — the class supplies table name and
    validation schema, and ``PipelineResult.instances()`` materializes
    objects of it."""

    table: type
    fields: Sequence[Union[Field, TempField]]
    join_keys: Sequence[Transform] = ()


@dataclass(frozen=True)
class TraversalSpec:
    """How to reach and iterate nodes under a root (reference
    core.py:190-226), with the same legacy path/inner_path compatibility
    contract."""

    path: Sequence[str]
    emits: Sequence[Union[TableEmit, InstanceEmit]]
    mode: str = "auto"
    inner_path: Optional[Sequence[str]] = None
    inner_mode: str = "auto"
    levels: Optional[Sequence[IterationLevel]] = None

    def get_levels(self) -> Sequence[IterationLevel]:
        if self.levels is not None:
            return self.levels
        out = [IterationLevel(path=self.path, mode=self.mode)]
        if self.inner_path is not None:
            out.append(
                IterationLevel(path=self.inner_path, mode=self.inner_mode)
            )
        return out


@dataclass(frozen=True)
class MappingSpec:
    """A full mapping: one or more traversals (reference
    core.py:229-236)."""

    traversals: Sequence[TraversalSpec]


def run_mapping(
    root,
    spec: MappingSpec,
    *,
    spark=None,
    errors: str = "collect",
) -> PipelineResult:
    """Execute a :class:`MappingSpec` against one root document /
    DataFrame (reference executor.py:217-437 ``run_mapping``).

    Compiles each traversal onto the fluent builder: every
    ``IterationLevel`` becomes ``goto(path).each(mode)``, every emit a
    ``map_to`` whose ``join_keys`` ride as temp columns.  Merge
    semantics (field-wise LWW in traversal order, merge policies on
    fields) are therefore byte-identical between the two API levels.
    """
    b = etl(root, spark=spark, errors=errors)
    for trav in spec.traversals:
        b = b.goto_root(0)
        for lvl in trav.get_levels():
            if lvl.path:
                b = b.goto(list(lvl.path))
            b = b.each(lvl.mode)
        for em in trav.emits:
            fields = list(em.fields)
            join_names: list[str] = []
            field_names = {f.name for f in fields}
            for i, t in enumerate(em.join_keys):
                name = f"__jk{i}"
                if name not in field_names:
                    fields.append(TempField(name, t))
                join_names.append(name)
            b = b.map_to(em.table, fields, join_on=join_names or None)
    return b.run()
