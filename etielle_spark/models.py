"""Typed output tables: model classes -> Spark schemas, field selectors.

The reference accepts Pydantic/SQLModel/SQLAlchemy/TypedDict/dataclass
models in ``map_to(table=Cls)`` (builder auto-detection,
etielle/fluent.py:284-317).  Here the stdlib-expressible subset —
dataclasses and TypedDicts — maps onto Spark ``StructType`` schemas
(validation = try-cast + errors DataFrame, the §2.9 channel); Pydantic
classes are honored when the library is importable (duck-typed on
``model_fields``), otherwise unneeded.

``field_of(Model, lambda u: u.email)`` resolves a field name from a typed
lambda, rejecting calls/indexing/chained access exactly like the
reference's tracer object (etielle/core.py:73-152).
"""

from __future__ import annotations

import dataclasses
import typing
from typing import Any, Callable, Optional, Union, get_args, get_origin, get_type_hints

from pyspark.sql import types as T


def _spark_type(py: Any) -> T.DataType:
    origin = get_origin(py)
    if origin is Union or str(origin) == "typing.Union":
        args = [a for a in get_args(py) if a is not type(None)]
        if len(args) == 1:
            return _spark_type(args[0])
        return T.StringType()
    if origin in (list, typing.List):
        (elem,) = get_args(py) or (str,)
        return T.ArrayType(_spark_type(elem))
    if origin in (dict, typing.Dict):
        args = get_args(py) or (str, str)
        return T.MapType(_spark_type(args[0]), _spark_type(args[1]))
    if py is bool:
        return T.BooleanType()
    if py is int:
        return T.LongType()
    if py is float:
        return T.DoubleType()
    if py is bytes:
        return T.BinaryType()
    import datetime

    if py is datetime.datetime:
        return T.TimestampType()
    if py is datetime.date:
        return T.DateType()
    return T.StringType()


def is_model_class(obj: Any) -> bool:
    if not isinstance(obj, type):
        return False
    return (
        dataclasses.is_dataclass(obj)
        or hasattr(obj, "__table__")  # SQLAlchemy / SQLModel declarative
        or hasattr(obj, "__annotations__")
        and (
            hasattr(obj, "__total__")  # TypedDict
            or hasattr(obj, "model_fields")  # pydantic v2 (duck-typed)
            or hasattr(obj, "__tablename__")
        )
    )


def table_name_of(cls: type) -> str:
    """__tablename__ / __table__.name if present else lowercased class
    name (reference attr inference, fluent.py:1634-1638)."""
    name = getattr(cls, "__tablename__", None)
    if name:
        return name
    table = getattr(cls, "__table__", None)
    if table is not None and getattr(table, "name", None):
        return table.name
    return cls.__name__.lower()


def spark_schema_of(cls: type) -> T.StructType:
    """Model class -> Spark schema.

    SQLAlchemy/SQLModel declarative classes (duck-typed on ``__table__``,
    reference fluent.py:284-317 + instances.py:363-411) map each Column's
    ``python_type`` and carry its ``nullable`` flag — a non-nullable DB
    column becomes a required field (NULL after merge -> finalize error).
    Pydantic v2 classes use ``model_fields``; dataclasses/TypedDicts use
    type hints.  Hint-based fields stay nullable (the engine's permissive
    default: missing paths yield NULL, not errors).
    """
    table = getattr(cls, "__table__", None)
    if table is not None and hasattr(table, "columns"):
        fields = []
        for col in table.columns:
            try:
                py = col.type.python_type
            except Exception:
                py = str
            fields.append(
                T.StructField(
                    col.name, _spark_type(py), bool(getattr(col, "nullable", True))
                )
            )
        return T.StructType(fields)
    if hasattr(cls, "model_fields"):  # pydantic v2
        hints = {k: f.annotation for k, f in cls.model_fields.items()}
    else:
        hints = get_type_hints(cls)
    fields = [T.StructField(name, _spark_type(py), True) for name, py in hints.items()]
    return T.StructType(fields)


class _FieldTracer:
    """Attribute probe that records exactly one access
    (reference etielle/core.py:73-152)."""

    def __init__(self) -> None:
        self.accessed: Optional[str] = None

    def __getattr__(self, name: str):
        if name.startswith("__"):
            raise AttributeError(name)
        if self.accessed is not None:
            raise ValueError(
                "field_of: chained attribute access is not allowed; "
                "select exactly one field"
            )
        self.accessed = name
        return _Terminal()


class _Terminal:
    def __getattr__(self, name: str):
        if name.startswith("__"):
            raise AttributeError(name)
        raise ValueError("field_of: chained attribute access is not allowed")

    def __call__(self, *a, **k):
        raise ValueError("field_of: method calls are not allowed")

    def __getitem__(self, item):
        raise ValueError("field_of: indexing is not allowed")


def field_of(model: type, selector: Callable[[Any], Any]) -> str:
    """Resolve a field name from a typed lambda:
    ``field_of(User, lambda u: u.email) == "email"``."""
    tracer = _FieldTracer()
    selector(tracer)
    if tracer.accessed is None:
        raise ValueError("field_of: selector must access exactly one field")
    known = set(spark_schema_of(model).fieldNames()) if is_model_class(model) else None
    if known is not None and tracer.accessed not in known:
        raise ValueError(
            f"field_of: '{tracer.accessed}' is not a field of {model.__name__}"
        )
    return tracer.accessed


class InstanceBuilder:
    """Collect-time instance materialization (the Spark seam for the
    reference's InstanceBuilder, etielle/instances.py:93-132).

    The reference builder accumulates per-key field updates in Python and
    finalizes instances; this engine runs the merge DISTRIBUTED (groupBy
    + merge policies), so the builder's job shrinks to turning finalized
    row dicts into objects at collect time.  Subclass and override
    ``build`` to construct arbitrary objects;
    ``PipelineResult.instances()`` drives it.
    """

    def build(self, cls: Optional[type], data: dict) -> Any:
        """One finalized row -> an instance.  Default: dataclass /
        pydantic / model classes get ``cls(**fields)`` (unknown keys
        dropped); no class -> the plain dict."""
        if cls is None:
            return dict(data)
        if hasattr(cls, "__total__"):  # TypedDict: instances ARE dicts
            return dict(data)
        known = None
        if dataclasses.is_dataclass(cls):
            known = {f.name for f in dataclasses.fields(cls)}
        elif hasattr(cls, "model_fields"):
            known = set(cls.model_fields)
        elif is_model_class(cls):
            known = set(spark_schema_of(cls).fieldNames())
        kwargs = {
            k: v for k, v in data.items() if known is None or k in known
        }
        return cls(**kwargs)

    def build_all(self, cls: Optional[type], rows: list[dict]) -> list[Any]:
        return [self.build(cls, r) for r in rows]


class ConstructorBuilder(InstanceBuilder):
    """Instances via plain ``cls(**fields)`` (reference
    instances.py:363-383) — the default ``build`` already constructs
    through the constructor; this subclass pins that behavior by name."""


class TypedDictBuilder(InstanceBuilder):
    """TypedDict instances ARE dicts (reference instances.py:341-360),
    restricted to the class's declared keys when a class is given."""

    def build(self, cls, data):
        if cls is not None and hasattr(cls, "__annotations__"):
            known = set(cls.__annotations__)
            return {k: v for k, v in data.items() if k in known}
        return dict(data)


class PydanticBuilder(InstanceBuilder):
    """Validating pydantic construction (reference instances.py:279-307):
    ``model_validate`` so field validators run; raises on invalid rows."""

    def build(self, cls, data):
        if cls is not None and hasattr(cls, "model_validate"):
            known = set(cls.model_fields)
            return cls.model_validate(
                {k: v for k, v in data.items() if k in known}
            )
        return super().build(cls, data)


class PydanticPartialBuilder(InstanceBuilder):
    """Non-validating pydantic construction (reference
    instances.py:310-338): ``model_construct`` — rows that failed
    schema validation upstream can still materialize for inspection."""

    def build(self, cls, data):
        if cls is not None and hasattr(cls, "model_construct"):
            known = set(cls.model_fields)
            return cls.model_construct(
                **{k: v for k, v in data.items() if k in known}
            )
        return super().build(cls, data)
