"""Supabase-shape adapter parity, tested the way the reference tests it
(reference tests/test_supabase_adapter.py:50-650 runs the unit tier
against a mocked client — here the package ships a recording fake with
the same protocol surface, so no HTTP and no supabase-py needed)."""

from __future__ import annotations

import pytest

from etielle_spark import Field, etl, get, get_from_parent
from etielle_spark.sources.supabase import (
    SupabaseSink,
    fake_client,
    insert_batches,
    insert_returning,
    is_supabase_client,
)


def test_insert_batches_slices_batches():
    """7 rows at batch_size=3 -> 3 insert calls of sizes 3/3/1; the
    return value concatenates the server-echoed rows in order."""
    client = fake_client()
    rows = [{"id": i, "name": f"n{i}"} for i in range(7)]
    seen = []
    out = insert_batches(
        client, "users", rows, batch_size=3,
        on_batch=lambda bn, bt, n: seen.append((bn, bt, n)),
    )
    assert [len(c[2]) for c in client.calls] == [3, 3, 1]
    assert all(c[0] == "users" and c[1] == "insert" for c in client.calls)
    assert out == rows
    assert seen == [(1, 3, 3), (2, 3, 3), (3, 3, 1)]


def test_insert_batches_empty_and_callback_error():
    client = fake_client()
    assert insert_batches(client, "users", []) == []
    assert client.calls == []

    def boom(bn, bt, n):
        raise RuntimeError("progress UI died")

    out = insert_batches(client, "users", [{"id": 1}], on_batch=boom)
    assert out == [{"id": 1}]  # callback errors never break the insert


def test_insert_batches_upsert_on_conflict():
    client = fake_client()
    insert_batches(
        client, "users", [{"email": "a@x"}], upsert=True, on_conflict="email"
    )
    assert client.calls == [("users", "upsert", [{"email": "a@x"}], "email")]


def test_insert_returning_count_mismatch_raises():
    """Two-phase phase 1: a server that echoes nothing (minimal REST
    response) makes positional ID capture unsafe -> ValueError."""
    silent = fake_client(echo=False)
    with pytest.raises(ValueError, match="Row count mismatch"):
        insert_returning(silent, "users", [{"id": 1}, {"id": 2}])
    ok = fake_client(generate_id="id")
    returned = insert_returning(ok, "users", [{"name": "Alice"}, {"name": "Bob"}])
    assert [r["id"] for r in returned] == [1, 2]
    assert [r["name"] for r in returned] == ["Alice", "Bob"]


def test_load_detects_supabase_client(spark):
    """Reference type-detection parity: load(client) stores the raw
    client on _session (plus upsert/batch_size attrs) and routes the
    flush through the Supabase sink."""
    client = fake_client()
    assert is_supabase_client(client)
    data = {"users": [{"id": "u1", "name": "Alice"}]}
    pipeline = (
        etl(data, spark=spark)
        .goto("users").each()
        .map_to("users", fields=[Field("id", get("id")), Field("name", get("name"))])
        .load(client, upsert=True, batch_size=500)
    )
    assert pipeline._session is client
    assert pipeline._upsert is True
    assert pipeline._batch_size == 500
    assert isinstance(pipeline._sink, SupabaseSink)


def test_pipeline_flush_to_fake_supabase_dependency_order(spark):
    """Multi-table pipeline flushes parents before children through the
    client, with row content intact (reference
    test_multi_table_insert_with_dependency_order)."""
    client = fake_client()
    data = {
        "users": [
            {"id": "u1", "name": "Alice",
             "posts": [{"id": "p1", "title": "Hello"}, {"id": "p2", "title": "World"}]},
            {"id": "u2", "name": "Bob", "posts": []},
        ]
    }
    (
        etl(data, spark=spark)
        .goto("users").each()
        .map_to("users", fields=[Field("id", get("id")), Field("name", get("name"))])
        .goto("posts").each()
        .map_to("posts", fields=[
            Field("id", get("id")),
            Field("user_id", get_from_parent("id")),
            Field("title", get("title")),
        ])
        .link_to("users", by={"user_id": "id"})
        .load(client)
        .run()
    )
    tables_in_order = [c[0] for c in client.calls]
    assert tables_in_order.index("users") < tables_in_order.index("posts")
    assert {r["name"] for r in client.rows["users"]} == {"Alice", "Bob"}
    assert {(r["user_id"], r["title"]) for r in client.rows["posts"]} == {
        ("u1", "Hello"), ("u1", "World"),
    }


def test_pipeline_upsert_with_per_table_conflict_columns(spark):
    """upsert_on maps table -> conflict column(s); lists join to the
    comma form (reference test_upsert_with_per_table_conflict_columns)."""
    client = fake_client()
    data = {
        "users": [{"id": "u1", "email": "a@x",
                   "posts": [{"id": "p1", "slug": "hello"}]}],
    }
    (
        etl(data, spark=spark)
        .goto("users").each()
        .map_to("users", fields=[Field("id", get("id")), Field("email", get("email"))])
        .goto("posts").each()
        .map_to("posts", fields=[
            Field("id", get("id")),
            Field("user_id", get_from_parent("id")),
            Field("slug", get("slug")),
        ])
        .load(client, upsert=True,
              upsert_on={"users": "email", "posts": ["user_id", "slug"]})
        .run()
    )
    conflicts = {c[0]: c[3] for c in client.calls}
    ops = {c[1] for c in client.calls}
    assert ops == {"upsert"}
    assert conflicts["users"] == "email"
    assert conflicts["posts"] == "user_id,slug"


def test_sink_batching_via_pipeline(spark):
    """batch_size pages the sink's HTTP round trips (reference
    test_batching: 5 rows / batch_size 2 -> 3 insert calls)."""
    client = fake_client()
    data = {"users": [{"id": f"u{i}", "name": f"n{i}"} for i in range(5)]}
    (
        etl(data, spark=spark)
        .goto("users").each()
        .map_to("users", fields=[Field("id", get("id")), Field("name", get("name"))])
        .load(client, batch_size=2)
        .run()
    )
    assert [len(c[2]) for c in client.calls] == [2, 2, 1]
    assert len(client.rows["users"]) == 5


def test_sink_on_batch_progress(spark):
    """SupabaseSink's table-aware progress callback: batch_total is
    computed up front so (batch_num, batch_total) means what it does in
    the reference adapter."""
    client = fake_client()
    seen = []
    sink = SupabaseSink(
        client, batch_size=2,
        on_batch=lambda t, bn, bt, n: seen.append((t, bn, bt, n)),
    )
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(5)], "id long, name string"
    )
    sink.write("users", df)
    assert seen == [("users", 1, 3, 2), ("users", 2, 3, 2), ("users", 3, 3, 1)]
    assert len(sink.returned["users"]) == 5


def test_supabase_two_phase_fk(spark):
    """Reference two-phase flow (test_two_phase_insert_populates_child_fk):
    parents inserted, DB-generated ids captured from the echoed rows,
    child FK columns populated before the child insert."""
    from etielle_spark.sources.twophase import supabase_two_phase_insert

    client = fake_client(generate_id="id")
    users = spark.createDataFrame(
        [("alice@x", "Alice"), ("bob@x", "Bob")], "email string, name string"
    )
    posts = spark.createDataFrame(
        [("alice@x", "Hello"), ("alice@x", "World"), ("bob@x", "Goodbye")],
        "user_email string, title string",
    )
    children, n_parents, n_children = supabase_two_phase_insert(
        client, "users", users, "posts", posts,
        by={"user_email": "email"}, fk_col="user_id",
    )
    assert (n_parents, n_children) == (2, 3)
    uid = {r["email"]: r["id"] for r in client.rows["users"]}
    assert set(uid.values()) == {1, 2}
    got = {(r["title"], r["user_id"]) for r in client.rows["posts"]}
    assert got == {
        ("Hello", uid["alice@x"]), ("World", uid["alice@x"]),
        ("Goodbye", uid["bob@x"]),
    }


def test_supabase_two_phase_count_mismatch_raises(spark):
    """A silent server (no echoed rows) must abort phase 1 before any
    child FK wiring happens."""
    from etielle_spark.sources.twophase import supabase_two_phase_insert

    silent = fake_client(echo=False)
    users = spark.createDataFrame([("a@x", "A")], "email string, name string")
    posts = spark.createDataFrame([("a@x", "t")], "user_email string, title string")
    with pytest.raises(ValueError, match="Row count mismatch"):
        supabase_two_phase_insert(
            silent, "users", users, "posts", posts,
            by={"user_email": "email"}, fk_col="user_id",
        )
