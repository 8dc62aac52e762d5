"""Model-class tables, field_of selectors, telemetry events
(SURVEY §1.2, §2.9)."""

from dataclasses import dataclass
from typing import Optional

import pytest

from etielle_spark import Field, etl, get
from etielle_spark.models import field_of, spark_schema_of, table_name_of
from etielle_spark.sources import CollectSink
from etielle_spark.telemetry import FlushCompleted, MapCompleted, MapStarted


@dataclass
class User:
    __tablename__ = "users"
    id: str
    age: Optional[int] = None


def test_model_class_map_to(spark):
    data = {"users": [{"id": "u1", "age": "30"}, {"id": "u2", "age": "bad"}]}
    result = (
        etl(data, spark=spark)
        .goto("users")
        .each()
        .map_to(
            User,
            fields=[Field("id", get("id")), Field("age", get("age"))],
            join_on=["id"],
        )
        .run()
    )
    assert "users" in result.tables
    rows = {r["id"]: r["age"] for r in result.rows("users")}
    assert rows == {"u1": 30}  # typed via the dataclass hints
    assert result.errors["users"].count() == 1
    stats = result.stats()
    assert stats["users"] == {"mapped": 1, "errors": 1}


def test_schema_derivation():
    schema = spark_schema_of(User)
    assert schema["id"].dataType.simpleString() == "string"
    assert schema["age"].dataType.simpleString() == "bigint"
    assert table_name_of(User) == "users"


def test_field_of_selector():
    assert field_of(User, lambda u: u.age) == "age"
    with pytest.raises(ValueError, match="not a field"):
        field_of(User, lambda u: u.email)
    with pytest.raises(ValueError, match="chained"):
        field_of(User, lambda u: u.age.real)
    with pytest.raises(ValueError, match="calls"):
        field_of(User, lambda u: u.age())


def test_telemetry_events(spark):
    events = []
    sink = CollectSink()
    (
        etl({"users": [{"id": "u1"}]}, spark=spark, on_event=events.append)
        .goto("users")
        .each()
        .map_to("users", fields=[Field("id", get("id"))], join_on=["id"])
        .load(sink)
        .run()
    )
    kinds = [type(e).__name__ for e in events]
    assert "MapStarted" in kinds and "MapCompleted" in kinds
    flush = [e for e in events if isinstance(e, FlushCompleted)]
    assert flush and flush[0].inserted == 1


def test_telemetry_callback_errors_swallowed(spark):
    def bad_callback(event):
        raise RuntimeError("boom")

    result = (
        etl({"users": [{"id": "u1"}]}, spark=spark, on_event=bad_callback)
        .goto("users")
        .each()
        .map_to("users", fields=[Field("id", get("id"))], join_on=["id"])
        .run()
    )
    assert result["users"].count() == 1


def test_pydantic_model_class(spark):
    pydantic = pytest.importorskip("pydantic")

    class Person(pydantic.BaseModel):
        pid: str
        score: Optional[float] = None

    data = {"people": [{"pid": "a", "score": "1.5"}, {"pid": "b", "score": "oops"}]}
    result = (
        etl(data, spark=spark)
        .goto("people")
        .each()
        .map_to(
            Person,
            fields=[Field("pid", get("pid")), Field("score", get("score"))],
            join_on=["pid"],
        )
        .run()
    )
    rows = {r["pid"]: r["score"] for r in result.rows("person")}
    assert rows == {"a": 1.5}
    assert result.errors["person"].count() == 1


def test_result_access_by_model_class(spark):
    result = (
        etl({"users": [{"id": "u1", "age": "3"}]}, spark=spark)
        .goto("users")
        .each()
        .map_to(User, fields=[Field("id", get("id")), Field("age", get("age"))], join_on=["id"])
        .run()
    )
    assert result[User].count() == 1  # class-based access (tables proxy)


def test_custom_merge_policy(spark):
    from pyspark.sql import functions as F

    from etielle_spark import MergePolicy

    class ProductPolicy(MergePolicy):
        """User-defined aggregate: product of supplied values."""

        def agg(self, value, ord_col, dtype):
            return F.exp(F.sum(F.when(ord_col.isNotNull(), F.log(value))))

    data = {"xs": [{"k": "a", "v": 2.0}, {"k": "a", "v": 3.0}, {"k": "a", "v": 4.0}]}
    result = (
        etl(data, spark=spark)
        .goto("xs")
        .each()
        .map_to(
            "t",
            fields=[Field("k", get("k")), Field("prod", get("v"), merge=ProductPolicy())],
            join_on=["k"],
        )
        .run()
    )
    rows = result.rows("t")
    assert len(rows) == 1 and abs(rows[0]["prod"] - 24.0) < 1e-9


class _FakeColumnType:
    def __init__(self, py):
        self.python_type = py


class _FakeColumn:
    def __init__(self, name, py, nullable=True):
        self.name = name
        self.type = _FakeColumnType(py)
        self.nullable = nullable


class _FakeTable:
    """Duck-typed SQLAlchemy Table: .name + .columns."""

    def __init__(self, name, cols):
        self.name = name
        self.columns = cols


class _SAUser:
    """Duck-typed SQLAlchemy declarative model (the library is not
    installed here; the engine detects __table__/__tablename__ exactly as
    it would on a real declarative class — reference fluent.py:284-317,
    instances.py:363-411)."""

    __tablename__ = "sa_users"
    __table__ = _FakeTable(
        "sa_users",
        [
            _FakeColumn("uid", str, nullable=False),
            _FakeColumn("age", int, nullable=True),
            _FakeColumn("score", float, nullable=True),
        ],
    )


def test_sqlalchemy_model_class_detection():
    from pyspark.sql import types as T

    from etielle_spark.models import is_model_class, spark_schema_of, table_name_of

    assert is_model_class(_SAUser)
    assert table_name_of(_SAUser) == "sa_users"
    schema = spark_schema_of(_SAUser)
    assert schema["uid"].dataType == T.StringType() and not schema["uid"].nullable
    assert schema["age"].dataType == T.LongType() and schema["age"].nullable
    assert schema["score"].dataType == T.DoubleType()


def test_sqlalchemy_model_map_to_end_to_end(spark):
    data = {"users": [{"uid": "u1", "age": "30", "score": 1.5}, {"uid": "u2", "age": "x", "score": 2.0}]}
    result = (
        etl(data, spark=spark)
        .goto("users")
        .each()
        .map_to(
            _SAUser,
            fields=[Field("uid", get("uid")), Field("age", get("age")), Field("score", get("score"))],
            join_on=["uid"],
        )
        .run()
    )
    rows = {r["uid"]: (r["age"], r["score"]) for r in result.rows("sa_users")}
    assert rows == {"u1": (30, 1.5)}
    errs = result.errors["sa_users"].collect()
    assert len(errs) == 1 and errs[0]["stage"] == "update" and errs[0]["field"] == "age"


def test_update_vs_finalize_error_stages(spark):
    """Two-stage validation (reference instances.py:204-224): a supplied
    value failing its field cast is an 'update' error; a merged row whose
    required (non-nullable) field ends up NULL is a 'finalize' error."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("pid", T.StringType(), False),
            T.StructField("age", T.IntegerType(), False),
            T.StructField("note", T.StringType(), True),
        ]
    )
    data = {
        "people": [
            {"pid": "a", "age": "30", "note": "ok"},
            {"pid": "b", "age": "bad", "note": "cast fails -> update"},
            {"pid": "c", "note": "age never set -> finalize"},
        ]
    }
    result = (
        etl(data, spark=spark)
        .goto("people")
        .each()
        .map_to(
            "people",
            fields=[
                Field("pid", get("pid")),
                Field("age", get("age")),
                Field("note", get("note")),
            ],
            join_on=["pid"],
            schema=schema,
        )
        .run()
    )
    assert {r["pid"] for r in result.rows("people")} == {"a"}
    errs = {(r["key"], r["stage"]) for r in result.errors["people"].collect()}
    assert errs == {("b", "update"), ("c", "finalize")}


def test_instance_builder_default_and_custom(spark):
    """Collect-time InstanceBuilder (reference instances.py:93-132): the
    finalized rows materialize as model-class instances; custom builders
    override build()."""
    from etielle_spark.models import InstanceBuilder

    data = {"users": [{"id": "u1", "age": 30}, {"id": "u2", "age": 41}]}
    result = (
        etl(data, spark=spark)
        .goto("users")
        .each()
        .map_to(
            User,
            fields=[Field("id", get("id")), Field("age", get("age"))],
            join_on=["id"],
        )
        .run()
    )
    built = result.instances("users", ordered=True)
    assert [type(u) for u in built] == [User, User]
    assert [(u.id, u.age) for u in built] == [("u1", 30), ("u2", 41)]
    # by class too
    assert [(u.id, u.age) for u in result.instances(User, ordered=True)] == [
        ("u1", 30),
        ("u2", 41),
    ]

    class UpperBuilder(InstanceBuilder):
        def build(self, cls, row):
            return row["id"].upper()

    assert result.instances("users", builder=UpperBuilder(), ordered=True) == ["U1", "U2"]
