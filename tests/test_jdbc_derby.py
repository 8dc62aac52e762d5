"""Real-DB round trip over JDBC (embedded Apache Derby, which ships on
Spark's classpath): JdbcSink flush, streaming upsert, and the two-phase
FK flow against DB-assigned IDENTITY ids.

Behavior spec: the reference's SQLAlchemy/Supabase integration
(etielle/fluent.py:1584-1708, adapters/supabase_adapter.py:14-71;
exercised by its tests/test_fluent_sqlalchemy.py:41-884) — insert
parents, capture DB-generated ids, populate child FKs, upsert on
conflict keys.
"""

import tempfile

import pytest
from pyspark.sql import functions as F

from etielle_spark import Field, etl, get
from etielle_spark.sources import JdbcSink

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby_url(spark):
    db = tempfile.mkdtemp(prefix="derby_") + "/db"
    return f"jdbc:derby:{db};create=true"


def _read(spark, url, table):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DRIVER)
        .load()
    )


def _exec_ddl(spark, url, *stmts):
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        for s in stmts:
            st.execute(s)
        st.close()
    finally:
        conn.close()


def test_jdbc_sink_topological_flush(spark, derby_url):
    """load(JdbcSink) writes parents before children into a real DB."""
    data = {
        "users": [{"id": "u1", "name": "A"}, {"id": "u2", "name": "B"}],
        "posts": [{"id": "p1", "user": "u1"}, {"id": "p2", "user": "u2"}],
    }
    sink = JdbcSink(derby_url, driver=DRIVER)
    (
        etl(data, spark=spark)
        .goto("users")
        .each()
        .map_to("users", fields=[Field("id", get("id")), Field("name", get("name"))], join_on=["id"])
        .goto_root(0)
        .goto("posts")
        .each()
        .map_to("posts", fields=[Field("id", get("id")), Field("user_id", get("user"))], join_on=["id"])
        .link_to("users", by={"user_id": "id"})
        .load(sink)
        .run()
    )
    users = {r["id"]: r["name"] for r in _read(spark, derby_url, "users").collect()}
    posts = {r["id"]: r["user_id"] for r in _read(spark, derby_url, "posts").collect()}
    assert users == {"u1": "A", "u2": "B"}
    assert posts == {"p1": "u1", "p2": "u2"}


def test_jdbc_streaming_upsert_roundtrip(spark, derby_url):
    """Chunked streaming with UpsertFlushStrategy, final tables flushed
    through JDBC and read back from the DB."""
    from etielle_spark.streaming import PreSegmentedChunkSource, UpsertFlushStrategy, stream

    chunks = [
        [{"users": [{"id": "u1", "score": 1}, {"id": "u2", "score": 2}]}],
        [{"users": [{"id": "u1", "score": 10}, {"id": "u3", "score": 3}]}],
    ]
    sink = JdbcSink(derby_url, driver=DRIVER)
    (
        stream(
            PreSegmentedChunkSource(chunks),
            spark=spark,
            flush_strategy=UpsertFlushStrategy("update"),
        )
        .goto("users")
        .each()
        .map_to("users", fields=[Field("id", get("id")), Field("score", get("score"))], join_on=["id"])
        .load(sink)
        .run()
    )
    back = {r["id"]: r["score"] for r in _read(spark, derby_url, "users").collect()}
    # u1 upserted by the second chunk
    assert back == {"u1": 10, "u2": 2, "u3": 3}


def test_two_phase_fk_with_db_identity(spark, derby_url):
    """Phase 1: insert parents into a table whose id is a Derby IDENTITY
    column (the DB assigns it); read back id+natural key. Phase 2:
    children pick up the generated id via populate_child_fk — the real-DB
    version of the parquet two-phase flow (reference fluent.py:902-1059)."""
    from etielle_spark.sources.twophase import populate_child_fk

    _exec_ddl(
        spark,
        derby_url,
        "CREATE TABLE USERS ("
        "ID BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY, "
        "USERNAME VARCHAR(50) NOT NULL)",
    )
    parents = spark.createDataFrame(
        [("alice",), ("bob",), ("carol",)], "USERNAME string"
    )
    (
        parents.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "USERS")
        .option("driver", DRIVER)
        .mode("append")
        .save()
    )
    written = _read(spark, derby_url, "USERS").select(
        F.col("ID").alias("gen_id"), F.col("USERNAME").alias("username")
    )
    ids = {r["username"]: r["gen_id"] for r in written.collect()}
    assert sorted(ids.values()) == [1, 2, 3]  # DB-assigned identity

    children = spark.createDataFrame(
        [("p1", "alice"), ("p2", "bob"), ("p3", "ghost")],
        "post string, author string",
    )
    linked = populate_child_fk(
        children, written, by={"author": "username"}, fk_col="user_id"
    )
    got = {r["post"]: r["user_id"] for r in linked.collect()}
    assert got == {"p1": ids["alice"], "p2": ids["bob"], "p3": None}

    with pytest.raises(RuntimeError, match="unwritten parents"):
        populate_child_fk(
            children, written, by={"author": "username"}, fk_col="user_id", required=True
        )


def test_jdbc_sink_on_batch_progress(spark, derby_url):
    """The on_batch progress seam (reference insert_batches' per-batch
    callback, supabase_adapter.py:14-71): per-table events observed
    during/after the write, always ending in (total, total)."""
    events = []
    sink = JdbcSink(
        derby_url, driver=DRIVER,
        on_batch=lambda table, done, total: events.append((table, done, total)),
    )
    data = {"users": [{"id": f"u{i}", "name": f"N{i}"} for i in range(40)]}
    (
        etl(data, spark=spark)
        .goto("users")
        .each()
        .map_to(
            "progress_users",
            fields=[Field("id", get("id")), Field("name", get("name"))],
            join_on=["id"],
        )
        .load(sink)
        .run()
    )
    assert events, "no progress events"
    tables = {e[0] for e in events}
    assert tables == {"progress_users"}
    final = events[-1]
    assert final[1] == final[2] > 0  # ends complete
    assert all(0 <= d <= t for _, d, t in events)
    # monotone progress
    dones = [d for _, d, _ in events]
    assert dones == sorted(dones)
    # rows actually landed
    assert _read(spark, derby_url, "progress_users").count() == 40

    # callback exceptions are swallowed
    def boom(*a):
        raise RuntimeError("cb")

    sink2 = JdbcSink(derby_url, driver=DRIVER, mode="append", on_batch=boom)
    df = spark.range(3).select(F.col("id").cast("string").alias("id"),
                               F.lit("x").alias("name"))
    sink2.write("progress_users", df)
    assert _read(spark, derby_url, "progress_users").count() == 43
