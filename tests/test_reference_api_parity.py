"""Top-level API parity with the reference package: every name in the
reference's ``__all__`` either imports from ``etielle_spark`` under the
same name or is a documented structural divergence (FlushContext,
MappingRuntimeState — see corespec module docstring).  ``Context``
imports by name too (the UDF-time chain type apply_ctx materializes)."""

import pytest

REFERENCE_ALL = [
    # core
    "CoreField", "IterationLevel", "MappingResult", "MappingSpec",
    "TableEmit", "Transform", "TraversalSpec", "field_of",
    # instances
    "InstanceEmit", "FieldSpec", "InstanceBuilder", "PydanticBuilder",
    "PydanticPartialBuilder", "TypedDictBuilder", "ConstructorBuilder",
    "MergePolicy", "AddPolicy", "AppendPolicy", "ExtendPolicy",
    "MinPolicy", "MaxPolicy", "FirstNonNullPolicy",
    # fluent
    "etl", "stream", "ErrorMode", "Field", "TempField", "FieldUnion",
    "transform", "PipelineResult", "PipelineBuilder", "TableStats",
    # telemetry
    "TelemetryEvent", "TelemetryEventTypes", "TelemetryCallback",
    "MapStarted", "MapCompleted", "FlushStarted", "FlushCompleted",
    "FlushFailed",
    # transforms
    "Context", "apply", "get", "get_from_root", "get_from_parent", "literal",
    "concat", "coalesce", "format_id", "key", "index", "parent_key",
    "parent_index", "node", "len_of", "lookup",
    # relationships
    "ManyToOneSpec", "compute_relationship_keys", "bind_many_to_one",
    "RelationshipIncompleteError", "validate_relationship_completeness",
    # streaming / chunking
    "Chunk", "ChunkSource", "FlushStrategy", "KeyCompleteFlushStrategy",
    "UpsertFlushStrategy", "BufferedKeyFlushStrategy",
    "OneRecordPerChunkSource", "CallableChunkSource",
    "GroupByChunkSource", "PreSegmentedChunkSource",
    "ExternalPartitionChunkSource",
]

# reference names whose per-row-interpreter shape has no compiled analog;
# each is named and justified in etielle_spark/corespec.py's docstring
# (Context is covered: apply_ctx materializes the chain inside UDFs)
DOCUMENTED_DIVERGENCES = {"FlushContext", "MappingRuntimeState"}


def test_every_reference_name_importable():
    import etielle_spark as es

    missing = [n for n in REFERENCE_ALL if not hasattr(es, n)]
    assert not missing, f"reference __all__ names absent: {missing}"


def test_run_mapping_spec_level(spark):
    """The plan-level core API produces the same tables as the fluent
    chain (reference executor.py run_mapping over explicit specs)."""
    from etielle_spark import (
        Field, IterationLevel, MappingSpec, TableEmit, TraversalSpec,
        etl, get, key, run_mapping,
    )

    doc = {
        "users": {
            "u1": {"name": "ada", "score": 1},
            "u2": {"name": "bob", "score": 2},
        }
    }
    spec = MappingSpec(
        traversals=[
            TraversalSpec(
                path=["users"],
                mode="items",
                emits=[
                    TableEmit(
                        table="users",
                        fields=[
                            Field("uid", key()),
                            Field("name", get("name")),
                            Field("score", get("score")),
                        ],
                        join_keys=[key()],
                    )
                ],
            )
        ]
    )
    res = run_mapping(doc, spec, spark=spark)
    got = {(r["uid"], r["name"], r["score"]) for r in res.rows("users")}
    assert got == {("u1", "ada", 1), ("u2", "bob", 2)}

    fluent = (
        etl(doc, spark=spark)
        .goto("users").each("items")
        .map_to("users", [
            Field("uid", key()),
            Field("name", get("name")),
            Field("score", get("score")),
        ], join_on=["uid"])
        .run()
    )
    assert got == {(r["uid"], r["name"], r["score"])
                   for r in fluent.rows("users")}


def test_run_mapping_levels_and_merge(spark):
    """Two traversals emitting to one table merge exactly like two
    fluent map_to calls (LWW across traversals by arrival order)."""
    from etielle_spark import (
        Field, MappingSpec, TableEmit, TraversalSpec, get, run_mapping,
    )

    doc = {
        "a": [{"id": 1, "v": "first"}],
        "b": [{"id": 1, "v": "second"}, {"id": 2, "v": "only"}],
    }
    emit = lambda: TableEmit(
        table="t",
        fields=[Field("id", get("id")), Field("v", get("v"))],
        join_keys=[get("id")],
    )
    res = run_mapping(
        doc,
        MappingSpec([
            TraversalSpec(path=["a"], emits=[emit()]),
            TraversalSpec(path=["b"], emits=[emit()]),
        ]),
        spark=spark,
    )
    got = {(r["id"], r["v"]) for r in res.rows("t")}
    assert got == {(1, "second"), (2, "only")}


def test_bind_many_to_one_dataframe_level(spark):
    from etielle_spark import ManyToOneSpec, bind_many_to_one

    child = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "zz")], ["cid", "pkey"]
    )
    parent = spark.createDataFrame(
        [(10, "x", 1), (11, "y", 2), (12, "y", 3)], ["pid", "pk", "seq"]
    )
    spec = ManyToOneSpec(
        child_table="child", parent_table="parent", attr="parent_id",
        child_keys=["pkey"], parent_keys=["pk"], parent_fk="pid",
    )
    bound, errors = bind_many_to_one(child, parent, spec, order_col="seq")
    got = {(r.cid, r.parent_id) for r in bound.collect()}
    # duplicate parent key "y": last by seq wins -> pid 12
    assert got == {(1, 10), (2, 12)}
    assert [r.cid for r in errors.collect()] == [3]

    # required=False: unmatched child keeps NULL fk, no errors
    spec2 = ManyToOneSpec(
        child_table="child", parent_table="parent", attr="parent_id",
        child_keys=["pkey"], parent_keys=["pk"], parent_fk="pid",
        required=False,
    )
    bound2, errors2 = bind_many_to_one(child, parent, spec2, order_col="seq")
    assert bound2.count() == 3 and errors2.count() == 0

    with pytest.raises(ValueError):
        ManyToOneSpec("c", "p", "fk", ["a", "b"], ["x"])


def test_validate_relationship_completeness(spark):
    from etielle_spark import (
        ManyToOneSpec, RelationshipIncompleteError,
        validate_relationship_completeness,
    )

    child = spark.createDataFrame([(1, "x"), (2, "w")], ["cid", "pkey"])
    parent = spark.createDataFrame([(10, "x")], ["pid", "pk"])
    spec = ManyToOneSpec(
        child_table="c", parent_table="p", attr="fk",
        child_keys=["pkey"], parent_keys=["pk"], parent_fk="pid",
    )
    with pytest.raises(RelationshipIncompleteError):
        validate_relationship_completeness(child, parent, spec)
    ok_child = child.filter("pkey = 'x'")
    validate_relationship_completeness(ok_child, parent, spec)  # no raise


def test_table_stats_and_builders(spark):
    import dataclasses
    from etielle_spark import (
        ConstructorBuilder, Field, TableStats, TypedDictBuilder,
        etl, get,
    )

    @dataclasses.dataclass
    class User:
        uid: int
        name: str

    res = (
        etl({"users": [{"uid": 1, "name": "ada"}]}, spark=spark)
        .goto("users").each()
        .map_to(User, [Field("uid", get("uid")), Field("name", get("name"))],
                join_on=["uid"])
        .run()
    )
    stats = res.table_stats()
    assert isinstance(stats["user"], TableStats)
    assert stats["user"].mapped == 1 and stats["user"].errors == 0
    assert stats["user"].inserted == 0  # no sink attached

    built = res.instances(User, builder=ConstructorBuilder())
    assert built == [User(uid=1, name="ada")]
    as_dicts = res.instances(User, builder=TypedDictBuilder())
    assert as_dicts == [{"uid": 1, "name": "ada"}]


def test_external_partition_chunk_source():
    from etielle_spark import ExternalPartitionChunkSource

    recs = [("a", 1), ("b", 2), ("a", 3), ("c", 4), ("b", 5)]
    chunks = list(
        ExternalPartitionChunkSource(recs, key=lambda r: r[0]).chunks()
    )
    assert [c.roots for c in chunks] == [
        (("a", 1), ("a", 3)), (("b", 2), ("b", 5)), (("c", 4),)
    ]


def test_apply_ctx_full_context_chain(spark):
    """Context-aware UDFs receive the reference Context shape: node, key,
    index, parent chain, root."""
    from etielle_spark import Field, apply_ctx, etl

    doc = {
        "orgs": {
            "acme": {"teams": [{"name": "core"}, {"name": "infra"}]},
            "zeta": {"teams": [{"name": "ops"}]},
        }
    }

    def describe(ctx):
        # ctx: team node; parent: org node (dict key); root at top
        assert ctx.parent is not None and ctx.parent.key in ("acme", "zeta")
        assert isinstance(ctx.root, dict) and "orgs" in ctx.root
        return f"{ctx.parent.key}/{ctx.index}/{ctx.node['name']}"

    res = (
        etl(doc, spark=spark)
        .goto("orgs").each("items").goto("teams").each()
        .map_to("teams", [Field("desc", apply_ctx(describe))])
        .run()
    )
    got = {r["desc"] for r in res.rows("teams")}
    assert got == {"acme/0/core", "acme/1/infra", "zeta/0/ops"}


def test_transform_decorator_context_mode(spark):
    from etielle_spark import Field, etl, transform

    @transform
    def keyed(ctx, prefix):
        return f"{prefix}:{ctx.key}:{ctx.node}"

    res = (
        etl({"m": {"a": 1, "b": 2}}, spark=spark)
        .goto("m").each("items")
        .map_to("t", [Field("v", keyed("k", context=True))])
        .run()
    )
    assert {r["v"] for r in res.rows("t")} == {"k:a:1", "k:b:2"}


def test_readme_quickstart_verbatim(spark):
    """The reference README's quickstart (/root/reference/README.md:91-141)
    runs verbatim — same builder chain, same ``result.tables.items()`` /
    ``rows.values()`` access shape, same output dicts."""
    from etielle_spark import Field, etl, get, get_from_parent

    data = {
        "users": [
            {
                "id": "u1",
                "name": "Alice",
                "posts": [
                    {"id": "p1", "title": "Hello"},
                    {"id": "p2", "title": "World"},
                ],
            },
            {"id": "u2", "name": "Bob", "posts": []},
        ]
    }
    result = (
        etl(data, spark=spark)
        .goto("users").each()
        .map_to(table="users", fields=[
            Field("id", get("id")),
            Field("name", get("name")),
        ])
        .goto("posts").each()
        .map_to(table="posts", fields=[
            Field("id", get("id")),
            Field("user_id", get_from_parent("id")),
            Field("title", get("title")),
        ])
        .run()
    )
    out = {t: list(rows.values()) for t, rows in result.tables.items()}
    assert out["users"] == [
        {"id": "u1", "name": "Alice"},
        {"id": "u2", "name": "Bob"},
    ]
    assert out["posts"] == [
        {"id": "p1", "user_id": "u1", "title": "Hello"},
        {"id": "p2", "user_id": "u1", "title": "World"},
    ]


def test_etl_indices_and_flush_strategy_kwargs(spark):
    """Reference etl() signature parity: ``indices=`` pre-seeds lookup
    indices, ``flush_strategy=`` is accepted (batch flush is single-shot
    so it reduces to the default)."""
    from etielle_spark import Field, etl, get, lookup
    from etielle_spark.streaming.pipeline import UpsertFlushStrategy

    data = {"docs": [{"id": 1, "cat": "a"}, {"id": 2, "cat": "z"}]}
    result = (
        etl(
            data,
            spark=spark,
            indices={"catmap": {"a": "Alpha", "z": "Zulu"}},
            flush_strategy=UpsertFlushStrategy("update"),
        )
        .goto("docs").each()
        .map_to("t", fields=[
            Field("id", get("id")),
            Field("cat_name", lookup("catmap", get("cat"), default="?")),
        ], join_on=["id"])
        .run()
    )
    got = {r["id"]: r["cat_name"] for r in result.rows("t")}
    assert got == {1: "Alpha", 2: "Zulu"}


def test_tables_proxy_keyed_rows_and_dataframe_duality(spark):
    """tables[name] supports BOTH reference keyed-row access (key tuple
    -> row dict) and Spark DataFrame methods on the same object."""
    from etielle_spark import Field, etl, get

    data = {"docs": [{"k": 1, "v": "x"}, {"k": 2, "v": "y"}]}
    result = (
        etl(data, spark=spark)
        .goto("docs").each()
        .map_to("t", fields=[Field("k", get("k")), Field("v", get("v"))],
                join_on=["k"])
        .run()
    )
    t = result.tables["t"]
    # reference mapping surface
    assert len(t) == 2
    assert t[(1,)]["v"] == "x" and t[2]["v"] == "y"
    assert sorted(r["v"] for r in t.values()) == ["x", "y"]
    # Spark surface on the SAME object
    assert t.count() == 2
    assert set(t.df.columns) >= {"k", "v"}
