"""F5/F7/F8 variants: 3-level list nesting, mixed each/goto/each,
cross-root merge ordering, items/single modes
(reference tests/test_nested_iteration.py:191-574)."""

from etielle_spark import (
    Field,
    TempField,
    etl,
    get,
    get_from_parent,
    index,
    node,
    parent_index,
)


def test_three_level_list_nesting(spark):
    data = {"cube": [[[1, 2], [3]], [[4]]]}
    result = (
        etl(data, spark=spark)
        .goto("cube")
        .each()
        .each()
        .each()
        .map_to(
            "cells",
            fields=[
                Field("i", parent_index(2)),
                Field("j", parent_index(1)),
                Field("k", index()),
                Field("v", node()),
            ],
        )
        .run()
    )
    assert result.row_set("cells") == {
        (0, 0, 0, 1),
        (0, 0, 1, 2),
        (0, 1, 0, 3),
        (1, 0, 0, 4),
    }


def test_mixed_each_goto_each(spark):
    data = {
        "teams": [
            {"name": "t1", "roster": {"members": ["a", "b"]}},
            {"name": "t2", "roster": {"members": ["c"]}},
            {"name": "t3", "roster": {}},
        ]
    }
    result = (
        etl(data, spark=spark)
        .goto("teams")
        .each()
        .goto("roster.members")
        .each()
        .map_to(
            "members",
            fields=[
                Field("team", get_from_parent("name")),
                Field("member", node()),
                Field("pos", index()),
            ],
        )
        .run()
    )
    assert result.row_set("members") == {
        ("t1", "a", 0),
        ("t1", "b", 1),
        ("t2", "c", 0),
    }


def test_strings_are_scalars_not_char_lists(spark):
    # reference test_nested_iteration.py:305 — each() on a string yields
    # the string once (single mode), not its characters
    data = {"vals": ["ab", "cd"]}
    result = (
        etl(data, spark=spark)
        .goto("vals")
        .each()
        .map_to("t", fields=[Field("v", node())])
        .run()
    )
    assert result.row_set("t") == {("ab",), ("cd",)}


def test_cross_root_merge_order(spark):
    """Multi-root keyed merge: later root wins field-wise
    (reference fluent.py:1339-1371)."""
    root0 = {"users": [{"id": "u1", "name": "from-root-0", "a": 1}]}
    root1 = {"users": [{"id": "u1", "name": "from-root-1", "b": 2}]}
    result = (
        etl(root0, root1, spark=spark)
        .goto("users")
        .each()
        .map_to(
            "users",
            fields=[
                Field("id", get("id")),
                Field("name", get("name")),
                Field("a", get("a")),
            ],
            join_on=["id"],
        )
        .goto_root(1)
        .goto("users")
        .each()
        .map_to(
            "users",
            fields=[
                TempField("id", get("id")),
                Field("name", get("name")),
                Field("b", get("b")),
            ],
            join_on=["id"],
        )
        .run()
    )
    rows = result.rows("users")
    assert len(rows) == 1
    r = rows[0]
    # name overwritten by the later root; disjoint fields merged
    assert (r["name"], r["a"], r["b"]) == ("from-root-1", 1, 2)


def test_items_mode_on_list_and_single_mode_on_list(spark):
    data = {"xs": [10, 20]}
    items = (
        etl(data, spark=spark)
        .goto("xs")
        .each(mode="items")
        .map_to("t", fields=[Field("v", node())])
        .run()
    )
    assert items.row_set("t") == {(10,), (20,)}

    single = (
        etl(data, spark=spark)
        .goto("xs")
        .each(mode="single")
        .map_to("t2", fields=[Field("n", __import__("etielle_spark").len_of(node()))])
        .run()
    )
    # single mode: the list itself is the node
    assert single.row_set("t2") == {(2,)}


def test_empty_containers_yield_zero_rows(spark):
    data = {"a": [], "b": {}, "c": None}
    for path in ("a", "b", "c"):
        result = (
            etl(data, spark=spark)
            .goto(path)
            .each()
            .map_to("t", fields=[Field("v", node())])
            .run()
        )
        assert result.row_set("t") == set(), path


def test_map_type_iteration_dataframe_root(spark):
    """each() over a real MapType column (explicit schemas at scale, as
    opposed to JSON-inferred structs)."""
    from etielle_spark import key as t_key

    df = spark.createDataFrame(
        [({"a": 1, "b": 2},), ({"c": 3},)],
        "m map<string,int>",
    )
    result = (
        etl(df, spark=spark)
        .goto("m")
        .each()
        .map_to("t", fields=[Field("k", t_key()), Field("v", node())])
        .run()
    )
    assert result.row_set("t") == {("a", 1), ("b", 2), ("c", 3)}


def test_int_segment_paths(spark):
    """get('a.0.b') — digit segments index lists; out-of-bounds -> NULL
    (reference transforms.py:88-114)."""
    data = {
        "rows": [
            {"pair": [{"v": "first"}, {"v": "second"}]},
            {"pair": [{"v": "only"}]},
        ]
    }
    result = (
        etl(data, spark=spark)
        .goto("rows")
        .each()
        .map_to(
            "t",
            fields=[
                Field("a", get("pair.0.v")),
                Field("b", get("pair.1.v")),
                Field("z", get(["pair", -1, "v"])),
                Field("oob", get("pair.9.v")),
            ],
        )
        .run()
    )
    assert result.row_set("t") == {
        ("first", "second", "second", None),
        ("only", None, "only", None),
    }


def test_arrival_order_preserved(spark):
    """rows(ordered=True) restores traversal arrival order
    (reference executor.py:371-375)."""
    data = {"xs": [{"v": "c"}, {"v": "a"}, {"v": "b"}]}
    result = (
        etl(data, spark=spark)
        .goto("xs")
        .each()
        .map_to("t", fields=[Field("v", get("v"))])
        .run()
    )
    assert [r["v"] for r in result.rows("t", ordered=True)] == ["c", "a", "b"]


def test_get_from_root_inside_iteration(spark):
    from etielle_spark import get_from_root

    data = {"meta": {"v": 7}, "xs": [1, 2]}
    result = (
        etl(data, spark=spark)
        .goto("xs")
        .each()
        .map_to(
            "t",
            fields=[
                Field("x", node()),
                Field("mv", get_from_root("meta.v")),
                Field("missing", get_from_root("nope.deep")),
            ],
        )
        .run()
    )
    assert result.row_set("t") == {(1, 7, None), (2, 7, None)}


def test_mixed_auto_and_keyed_emissions_same_table(spark):
    """Auto-key rows append; keyed rows merge among themselves
    (reference executor.py:193-196 + 272-281)."""
    data = {
        "keyed": [{"id": "k1", "v": 1}, {"id": "k1", "v": 2}],
        "loose": [{"v": 10}, {"v": 20}],
    }
    result = (
        etl(data, spark=spark)
        .goto("keyed")
        .each()
        .map_to(
            "t",
            fields=[Field("id", get("id")), Field("v", get("v"))],
            join_on=["id"],
        )
        .goto_root(0)
        .goto("loose")
        .each()
        .map_to("t", fields=[Field("v", get("v"))])
        .run()
    )
    # k1 merged (LWW v=2); loose rows appended unmerged
    assert result.row_set("t", "id", "v") == {
        ("k1", 2),
        (None, 10),
        (None, 20),
    }


def test_parent_key_depth_two(spark):
    """parent_key(depth=2) through dict>dict>list nesting."""
    from etielle_spark import parent_key

    data = {
        "regions": {
            "emea": {"de": ["b1", "b2"], "fr": ["p1"]},
            "apac": {"jp": ["t1"]},
        }
    }
    result = (
        etl(data, spark=spark)
        .goto("regions")
        .each()
        .each()
        .each()
        .map_to(
            "cities",
            fields=[
                Field("region", parent_key(2)),
                Field("country", parent_key(1)),
                Field("city", node()),
            ],
        )
        .run()
    )
    assert result.row_set("cities") == {
        ("emea", "de", "b1"),
        ("emea", "de", "b2"),
        ("emea", "fr", "p1"),
        ("apac", "jp", "t1"),
    }


def test_mixed_kind_siblings_variant_unification(spark):
    """The same field carrying scalar / array / struct kinds across
    siblings: each row keeps ITS OWN value (VariantType unification; the
    round-1 boundary read NULL on the scalar side)."""
    from etielle_spark import Field, etl, get, key, node

    blob = {"root": {
        "k0": {"a": 7},
        "k1": {"a": [1, 2]},
        "k2": {"a": {"b": 5}},
        "k3": "plain",
    }}
    res = (
        etl(blob, spark=spark)
        .goto("root")
        .each()
        .map_to(
            "t",
            fields=[
                Field("k", key()),
                Field("a", get("a")),
                Field("ab", get("a.b")),
                Field("n", node()),
            ],
        )
        .run()
    )
    rows = {r["k"]: r for r in res.rows("t")}
    assert rows["k0"]["a"] == 7 and rows["k0"]["n"] == {"a": 7}
    assert rows["k1"]["a"] == [1, 2]
    assert rows["k2"]["a"] == {"b": 5} and rows["k2"]["ab"] == 5
    assert rows["k3"]["a"] is None and rows["k3"]["n"] == "plain"


def test_each_over_kind_mixed_siblings(spark):
    """each() over a path whose siblings disagree on list vs dict vs
    scalar: per-row dispatch via the variant serialization — array rows
    iterate with index, object rows with key, scalars behave as single,
    None yields nothing (the last round-1 representation boundary)."""
    from etielle_spark import Field, etl, get, get_from_parent, index, key, node

    docs = [
        {"id": 1, "x": [10, 20]},
        {"id": 2, "x": {"a": 1, "b": 2}},
        {"id": 3, "x": 5},
        {"id": 4, "x": None},
        {"id": 5, "x": {"n": {"deep": 7}}},
    ]
    res = (
        etl({"docs": docs}, spark=spark)
        .goto("docs").each().goto("x").each()
        .map_to("vals", [
            Field("pid", get_from_parent("id")),
            Field("k", key()),
            Field("i", index()),
            Field("deep", get("deep")),
        ])
        .run()
    )
    got = {(r["pid"], r["k"], r["i"], r["deep"]) for r in res.rows("vals")}
    assert got == {
        (1, None, 0, None), (1, None, 1, None),
        (2, "a", None, None), (2, "b", None, None),
        (3, None, None, None),
        (5, "n", None, 7),
    }

    # items mode restricts to object rows
    res2 = (
        etl({"docs": docs}, spark=spark)
        .goto("docs").each().goto("x").each("items")
        .map_to("it", [Field("pid", get_from_parent("id")), Field("k", key())])
        .run()
    )
    assert {(r["pid"], r["k"]) for r in res2.rows("it")} == {
        (2, "a"), (2, "b"), (5, "n")
    }


def test_len_of_variant_kind_dispatch(spark):
    """len_of over a kind-mixed (variant) node mirrors Python len():
    arrays/dicts count entries, strings count chars, numbers/None have
    no len."""
    from etielle_spark import Field, etl, get, len_of

    docs = [
        {"id": 1, "x": [10, 20, 30]},
        {"id": 2, "x": {"a": 1, "b": 2}},
        {"id": 3, "x": "hello"},
        {"id": 4, "x": 5},
        {"id": 5, "x": None},
    ]
    res = (
        etl({"docs": docs}, spark=spark)
        .goto("docs").each()
        .map_to("t", [Field("id", get("id")), Field("n", len_of(get("x")))],
                join_on=["id"])
        .run()
    )
    assert sorted((r["id"], r["n"]) for r in res.rows("t")) == [
        (1, 3), (2, 2), (3, 5), (4, None), (5, None)
    ]


def test_path_through_variant_array_element(spark):
    """get('a.0.x') where `a`'s ELEMENTS are kind-mixed across siblings
    (variant-wrapped): element access must unwrap the wrapper before the
    struct-field step, else it returns NULL instead of the value
    (round-2 ADVICE: resolve_path only unwrapped at entry/struct)."""
    docs = [
        {"id": 1, "a": [{"x": 11}]},  # struct elements
        {"id": 2, "a": [5, 6]},       # scalar elements -> variant unification
        {"id": 3, "a": None},
    ]
    res = (
        etl({"docs": docs}, spark=spark)
        .goto("docs").each()
        .map_to("t", [
            Field("id", get("id")),
            Field("x", get(["a", 0, "x"])),
            Field("e0", get(["a", 0])),
        ], join_on=["id"])
        .run()
    )
    rows = {r["id"]: (r["x"], r["e0"]) for r in res.rows("t")}
    assert rows[1] == (11, {"x": 11})
    assert rows[2] == (None, 5)
    assert rows[3] == (None, None)


def test_path_through_variant_map_value(spark):
    """Same unwrap requirement after MAP value access: dict-of-mixed
    values navigated by key then field."""
    docs = [
        {"id": 1, "m": {"k": {"x": 3}}},
        {"id": 2, "m": {"k": "str"}},
    ]
    res = (
        etl({"docs": docs}, spark=spark)
        .goto("docs").each()
        .map_to("t", [
            Field("id", get("id")),
            Field("x", get("m.k.x")),
        ], join_on=["id"])
        .run()
    )
    rows = {r["id"]: r["x"] for r in res.rows("t")}
    assert rows[1] == 3
    assert rows[2] is None


# --- round 3: string/number-mixed scalar fields (Python-equality keys) ---


def test_mixed_key_merge_keeps_int_and_string_distinct(spark):
    """A join_on field carrying 7 in one doc and '7' in another merges as
    TWO rows (Python dict semantics), not one coerced row."""
    from etielle_spark import Field, etl, get, literal

    data = {"docs": [
        {"k": 7, "v": "int-row"},
        {"k": "7", "v": "str-row"},
        {"k": 7, "v": "int-row-2"},
    ]}
    result = (
        etl(data, spark=spark)
        .goto("docs").each()
        .map_to("t", fields=[Field("k", get("k")), Field("v", get("v"))],
                join_on=["k"])
        .run()
    )
    rows = result.rows("t")
    assert len(rows) == 2  # 7 and '7' distinct; the two 7-docs merged
    by_v = {r["v"] for r in rows}
    assert by_v == {"int-row-2", "str-row"}  # LWW kept the later int doc


def test_mixed_key_lookup_never_crosses_kinds(spark):
    from etielle_spark import Field, etl, get, lookup

    data = {"docs": [{"id": 0, "k": 7}, {"id": 1, "k": "7"}, {"id": 2, "k": 8}]}
    idx = {7: "num", "7": "str"}
    result = (
        etl(data, spark=spark)
        .build_index("m", from_dict=idx)
        .goto("docs").each()
        .map_to("t", fields=[
            Field("id", get("id")),
            Field("v", lookup("m", get("k"), default="D")),
        ])
        .run()
    )
    got = {r["id"]: r["v"] for r in result.rows("t")}
    assert got == {0: "num", 1: "str", 2: "D"}


def test_mixed_key_null_and_empty_still_filtered(spark):
    from etielle_spark import Field, etl, get

    data = {"docs": [
        {"k": 7, "v": "a"}, {"k": "", "v": "b"}, {"k": None, "v": "c"},
        {"k": "x", "v": "d"}, {"k": 0, "v": "e"},
    ]}
    result = (
        etl(data, spark=spark)
        .goto("docs").each()
        .map_to("t", fields=[Field("k", get("k")), Field("v", get("v"))],
                join_on=["k"])
        .run()
    )
    vs = {r["v"] for r in result.rows("t")}
    # '' and None keys dropped; 0 is a VALID numeric key
    assert vs == {"a", "d", "e"}


def test_mixed_key_link_to_python_equality(spark):
    """link_to across a string/number-mixed key: child 7 links to parent
    7 (and 7.0), never to parent '7'."""
    from etielle_spark import Field, TempField, etl, get, get_from_parent

    data = {
        "parents": [{"pid": 7, "name": "P-int"}, {"pid": "7", "name": "P-str"}],
        "children": [{"ck": 7, "t": "c-int"}, {"ck": "7", "t": "c-str"}],
    }
    result = (
        etl(data, spark=spark)
        .goto("parents").each()
        .map_to("par", fields=[
            Field("name", get("name")), TempField("pid", get("pid")),
            Field("id", get("name")),
        ], join_on=["name"])
        .goto_root()
        .goto("children").each()
        .map_to("ch", fields=[Field("t", get("t")), TempField("ck", get("ck"))],
                join_on=["t"])
        .link_to("par", by={"ck": "pid"}, fk="parent_name")
        .run()
    )
    got = {r["t"]: r["parent_name"] for r in result.rows("ch")}
    assert got == {"c-int": "P-int", "c-str": "P-str"}


def test_mixed_key_backlink_python_equality(spark):
    """backlink over a string/number-mixed id list: 7 collects the
    int-keyed child, '7' the string-keyed one, in id-list order."""
    from etielle_spark import Field, TempField, etl, get

    data = {
        "qs": [{"qid": "q1", "cids": ["7", 7]}],
        "cs": [{"cid": 7, "t": "c-int"}, {"cid": "7", "t": "c-str"}],
    }
    result = (
        etl(data, spark=spark)
        .goto("qs").each()
        .map_to("q", fields=[Field("qid", get("qid")),
                             TempField("cids", get("cids"))], join_on=["qid"])
        .goto_root()
        .goto("cs").each()
        .map_to("c", fields=[Field("t", get("t")),
                             TempField("cid", get("cid"))], join_on=["t"])
        .backlink("q", "c", "children", by={"cids": "cid"})
        .run()
    )
    rows = result.rows("q")
    assert len(rows) == 1
    kids = [c["t"] for c in rows[0]["children"]]
    assert kids == ["c-str", "c-int"]  # id-list order, kinds never cross


def test_mixed_key_traversal_index_lww(spark):
    """build_index(key=..., value=...) over a string/number-mixed key
    field: 7 and '7' are distinct index entries; duplicate 7s LWW."""
    from etielle_spark import Field, etl, get, lookup

    data = {
        "pairs": [{"k": 7, "v": "num"}, {"k": "7", "v": "str"},
                  {"k": 7, "v": "num2"}],
        "probe": [{"id": 0, "k": 7}, {"id": 1, "k": "7"}, {"id": 2, "k": 9}],
    }
    result = (
        etl(data, spark=spark)
        .goto("pairs").each()
        .build_index("m", key=get("k"), value=get("v"))
        .goto_root()
        .goto("probe").each()
        .map_to("t", fields=[
            Field("id", get("id")),
            Field("v", lookup("m", get("k"), default="D")),
        ])
        .run()
    )
    got = {r["id"]: r["v"] for r in result.rows("t")}
    assert got == {0: "num2", 1: "str", 2: "D"}
