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
