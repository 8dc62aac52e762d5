"""Differential oracle against the reference implementation itself.

The reference (etielle) is pure Python with zero dependencies; when a
checkout is present at /root/reference, build the SAME pipeline in both
engines over seeded-random nested data and compare output tables row for
row.  Skipped cleanly when no reference checkout exists (the repo stays
standalone).

This is the strongest parity check available: not a hand-written
expectation, but the reference's own executor.
"""

import random
import sys

import pytest

REF_PATH = "/root/reference"


def _load_reference():
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    try:
        import etielle as ref  # noqa: F401
        from etielle.fluent import Field as RField
        from etielle.fluent import TempField as RTempField
        from etielle.fluent import etl as ref_etl
        from etielle.transforms import get as r_get
        from etielle.transforms import get_from_parent as r_gfp
        from etielle.transforms import index as r_index
        from etielle.transforms import key as r_key
        from etielle.fluent import node as r_node
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    return {
        "etl": ref_etl,
        "Field": RField,
        "TempField": RTempField,
        "get": r_get,
        "get_from_parent": r_gfp,
        "index": r_index,
        "key": r_key,
        "node": r_node,
    }


def random_users_data(rng: random.Random) -> dict:
    users = []
    for i in range(rng.randint(0, 8)):
        user = {"id": f"u{i}", "name": rng.choice(["ann", "bob", None, "cal"])}
        if rng.random() < 0.8:
            user["posts"] = [
                {"id": f"p{i}_{j}", "title": rng.choice(["x", "y", None])}
                for j in range(rng.randint(0, 4))
            ]
        users.append(user)
    return {"users": users}


def random_merge_data(rng: random.Random) -> dict:
    ids = [f"k{i}" for i in range(rng.randint(1, 6))] + ["", None]
    return {
        "a": [
            {"id": rng.choice(ids), "x": rng.choice([rng.randint(0, 9), None])}
            for _ in range(rng.randint(0, 10))
        ],
        "b": [
            {"ref": rng.choice(ids), "y": rng.choice(["p", "q", None])}
            for _ in range(rng.randint(0, 10))
        ],
    }


def norm_rows(rows):
    # The reference emits ragged dicts (a field merged from only one path
    # is simply absent); a DataFrame is rectangular (absent -> NULL).
    # Absent == NULL is the documented mapping (SURVEY §1.2), so None
    # fields are dropped on both sides before comparing.
    out = set()
    for r in rows:
        out.add(tuple(sorted((k, str(v)) for k, v in r.items() if v is not None)))
    return out


def ref_tables(ref, result, table):
    rows = list(result.tables[table].values())
    return norm_rows(dict(r) for r in rows)


@pytest.mark.parametrize("seed", range(6))
def test_differential_nested_extraction(spark, seed):
    ref = _load_reference()
    from etielle_spark import Field, etl, get, get_from_parent

    data = random_users_data(random.Random(seed))

    r = (
        ref["etl"](data)
        .goto("users")
        .each()
        .map_to(table="users", fields=[ref["Field"]("id", ref["get"]("id")), ref["Field"]("name", ref["get"]("name"))])
        .goto("posts")
        .each()
        .map_to(
            table="posts",
            fields=[
                ref["Field"]("id", ref["get"]("id")),
                ref["Field"]("user_id", ref["get_from_parent"]("id")),
                ref["Field"]("title", ref["get"]("title")),
            ],
        )
        .run()
    )
    s = (
        etl(data, spark=spark)
        .goto("users")
        .each()
        .map_to("users", fields=[Field("id", get("id")), Field("name", get("name"))])
        .goto("posts")
        .each()
        .map_to(
            "posts",
            fields=[
                Field("id", get("id")),
                Field("user_id", get_from_parent("id")),
                Field("title", get("title")),
            ],
        )
        .run()
    )
    for table in ("users", "posts"):
        want = ref_tables(ref, r, table) if table in r.tables else set()
        got = norm_rows(s.rows(table)) if table in s.tables else set()
        assert got == want, f"seed={seed} table={table}"


@pytest.mark.parametrize("seed", range(6))
def test_differential_keyed_merge(spark, seed):
    ref = _load_reference()
    from etielle_spark import Field, TempField, etl, get

    data = random_merge_data(random.Random(100 + seed))

    r = (
        ref["etl"](data)
        .goto("a")
        .each()
        .map_to(
            table="t",
            fields=[ref["Field"]("id", ref["get"]("id")), ref["Field"]("x", ref["get"]("x"))],
            join_on=["id"],
        )
        .goto_root(0)
        .goto("b")
        .each()
        .map_to(
            table="t",
            fields=[
                ref["TempField"]("id", ref["get"]("ref")),
                ref["Field"]("y", ref["get"]("y")),
            ],
            join_on=["id"],
        )
        .run()
    )
    s = (
        etl(data, spark=spark)
        .goto("a")
        .each()
        .map_to(
            "t",
            fields=[Field("id", get("id")), Field("x", get("x"))],
            join_on=["id"],
        )
        .goto_root(0)
        .goto("b")
        .each()
        .map_to(
            "t",
            fields=[TempField("id", get("ref")), Field("y", get("y"))],
            join_on=["id"],
        )
        .run()
    )
    want = ref_tables(ref, r, "t") if "t" in r.tables else set()
    got = norm_rows(s.rows("t")) if "t" in s.tables else set()
    assert got == want, f"seed={seed}"


@pytest.mark.parametrize("seed", range(4))
def test_differential_dict_iteration(spark, seed):
    ref = _load_reference()
    from etielle_spark import Field, etl, node, parent_key

    rng = random.Random(200 + seed)
    data = {
        "qc": {
            f"Q{i}": [f"c{rng.randint(0, 5)}" for _ in range(rng.randint(0, 3))]
            for i in range(rng.randint(0, 5))
        }
    }

    from etielle.transforms import parent_key as r_parent_key

    r = (
        ref["etl"](data)
        .goto("qc")
        .each()
        .each()
        .map_to(
            table="qc",
            fields=[
                ref["Field"]("q", r_parent_key()),
                ref["Field"]("c", ref["node"]()),
            ],
        )
        .run()
    )
    s = (
        etl(data, spark=spark)
        .goto("qc")
        .each()
        .each()
        .map_to("qc", fields=[Field("q", parent_key()), Field("c", node())])
        .run()
    )
    want = ref_tables(ref, r, "qc") if "qc" in r.tables else set()
    got = norm_rows(s.rows("qc")) if "qc" in s.tables else set()
    assert got == want, f"seed={seed}"


@pytest.mark.parametrize("seed", range(5))
def test_differential_merge_policies(spark, seed):
    ref = _load_reference()
    from etielle.instances import (
        AddPolicy as RAdd,
        AppendPolicy as RAppend,
        MaxPolicy as RMax,
        MinPolicy as RMin,
    )

    from etielle_spark import AddPolicy, AppendPolicy, Field, MaxPolicy, MinPolicy, etl, get

    rng = random.Random(300 + seed)
    events = [
        {
            "k": rng.choice(["a", "b", "c"]),
            "n": rng.choice([rng.randint(-5, 9), None]),
            "tag": rng.choice(["x", "y", None]),
            "m": rng.choice([rng.randint(0, 99), None]),
        }
        for _ in range(rng.randint(1, 14))
    ]
    data = {"events": events}

    r = (
        ref["etl"](data)
        .goto("events")
        .each()
        .map_to(
            table="out",
            fields=[
                ref["Field"]("k", ref["get"]("k")),
                ref["Field"]("total", ref["get"]("n"), merge=RAdd()),
                ref["Field"]("tags", ref["get"]("tag"), merge=RAppend()),
                ref["Field"]("lo", ref["get"]("m"), merge=RMin()),
                ref["Field"]("hi", ref["get"]("m"), merge=RMax()),
            ],
            join_on=["k"],
        )
        .run()
    )
    s = (
        etl(data, spark=spark)
        .goto("events")
        .each()
        .map_to(
            "out",
            fields=[
                Field("k", get("k")),
                Field("total", get("n"), merge=AddPolicy()),
                Field("tags", get("tag"), merge=AppendPolicy()),
                Field("lo", get("m"), merge=MinPolicy()),
                Field("hi", get("m"), merge=MaxPolicy()),
            ],
            join_on=["k"],
        )
        .run()
    )
    want = {}
    for row in r.tables["out"].values():
        d = dict(row)
        want[d["k"]] = (d.get("total"), tuple(d.get("tags") or ()), d.get("lo"), d.get("hi"))
    got = {}
    for d in s.rows("out"):
        got[d["k"]] = (d["total"], tuple(d["tags"] or ()), d["lo"], d["hi"])
    assert got == want, f"seed={seed}"


@pytest.mark.parametrize("seed", range(5))
def test_differential_scalar_transforms(spark, seed):
    """concat/format_id/coalesce/len_of over messy values (None, "", ints,
    strings, lists) — reference vs compiled columns."""
    ref = _load_reference()
    from etielle.transforms import (
        coalesce as r_coalesce,
        concat as r_concat,
        format_id as r_format_id,
        len_of as r_len_of,
    )

    from etielle_spark import (
        Field,
        coalesce as s_coalesce,
        concat as s_concat,
        etl,
        format_id as s_format_id,
        get,
        len_of as s_len_of,
    )

    rng = random.Random(400 + seed)
    scalars = ["x", "", None, "42", "long-ish value", "a b"]
    rows = [
        {
            "i": i,
            "a": rng.choice(scalars),
            "b": rng.choice(scalars),
            "n": rng.choice([rng.randint(-3, 99), None]),
            "xs": rng.choice([[1, 2, 3], [], None, [7]]),
        }
        for i in range(rng.randint(1, 12))
    ]
    data = {"rows": rows}

    def fields(F_, get_, concat_, format_id_, coalesce_, len_of_):
        return [
            F_("i", get_("i")),
            F_("cat", concat_(get_("a"), "|", get_("b"), get_("n"))),
            F_("fid", format_id_(get_("a"), get_("b"), get_("n"), sep="-")),
            F_("co", coalesce_(get_("a"), get_("b"))),
            F_("ln", len_of_(get_("xs"))),
            F_("ls", len_of_(get_("a"))),
        ]

    r = (
        ref["etl"](data)
        .goto("rows")
        .each()
        .map_to(
            table="t",
            fields=fields(ref["Field"], ref["get"], r_concat, r_format_id, r_coalesce, r_len_of),
        )
        .run()
    )
    s = (
        etl(data, spark=spark)
        .goto("rows")
        .each()
        .map_to("t", fields=fields(Field, get, s_concat, s_format_id, s_coalesce, s_len_of))
        .run()
    )
    want = ref_tables(ref, r, "t")
    got = norm_rows(s.rows("t"))
    assert got == want, f"seed={seed}"


def test_differential_trailing_goto_context(spark):
    """Trailing goto creates a single-mode context: index()=None,
    parent_index()=enclosing list index, node()=trailing node."""
    ref = _load_reference()
    from etielle.fluent import parent_index as r_parent_index

    from etielle_spark import Field, etl, get, index, node, parent_index

    data = {
        "users": [
            {"id": "u1", "profile": {"email": "a@x"}},
            {"id": "u2", "profile": {"email": "b@y"}},
            {"id": "u3"},  # no profile -> zero rows
        ]
    }
    r = (
        ref["etl"](data)
        .goto("users")
        .each()
        .goto("profile")
        .map_to(
            table="t",
            fields=[
                ref["Field"]("e", ref["get"]("email")),
                ref["Field"]("i", ref["index"]()),
                ref["Field"]("pi", r_parent_index()),
            ],
        )
        .run()
    )
    s = (
        etl(data, spark=spark)
        .goto("users")
        .each()
        .goto("profile")
        .map_to(
            "t",
            fields=[
                Field("e", get("email")),
                Field("i", index()),
                Field("pi", parent_index()),
            ],
        )
        .run()
    )
    want = ref_tables(ref, r, "t")
    got = norm_rows(s.rows("t"))
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_differential_heterogeneous_dict_iteration(spark, seed):
    """Dicts whose values have different shapes per key (the JSON norm):
    iterate entries; missing subfields read as None."""
    ref = _load_reference()
    from etielle_spark import Field, etl, get, key as s_key

    from etielle.transforms import key as r_key

    rng = random.Random(500 + seed)
    groups = {}
    for i in range(rng.randint(1, 5)):
        g = {}
        if rng.random() < 0.7:
            g["name"] = f"g{i}"
        if rng.random() < 0.5:
            g["size"] = rng.randint(1, 9)
        if rng.random() < 0.4:
            g["extra"] = {"deep": rng.randint(0, 5)}
        groups[f"key{i}"] = g
    data = {"groups": groups}

    r = (
        ref["etl"](data)
        .goto("groups")
        .each()
        .map_to(
            table="t",
            fields=[
                ref["Field"]("k", r_key()),
                ref["Field"]("name", ref["get"]("name")),
                ref["Field"]("size", ref["get"]("size")),
                ref["Field"]("deep", ref["get"]("extra.deep")),
            ],
        )
        .run()
    )
    s = (
        etl(data, spark=spark)
        .goto("groups")
        .each()
        .map_to(
            "t",
            fields=[
                Field("k", s_key()),
                Field("name", get("name")),
                Field("size", get("size")),
                Field("deep", get("extra.deep")),
            ],
        )
        .run()
    )
    want = ref_tables(ref, r, "t") if "t" in r.tables else set()
    got = norm_rows(s.rows("t")) if "t" in s.tables else set()
    assert got == want, f"seed={seed}"


@pytest.mark.parametrize("seed", range(5))
def test_differential_sibling_dicts_differing_keys(spark, seed):
    """Sibling dicts with DIFFERENT key sets (schema union would invent
    phantom (key, NULL) entries without per-row presence markers)."""
    ref = _load_reference()
    from etielle_spark import Field, etl, get_from_parent, key as s_key, node

    from etielle.transforms import key as r_key, get_from_parent as r_gfp

    rng = random.Random(700 + seed)
    keysets = [["a"], ["b"], ["a", "c"], ["d", "b"], [], ["e"]]
    users = []
    for i in range(rng.randint(2, 6)):
        prefs = {k: rng.randint(0, 9) for k in rng.choice(keysets)}
        users.append({"id": f"u{i}", "prefs": prefs})
    data = {"users": users}

    r = (
        ref["etl"](data)
        .goto("users")
        .each()
        .goto("prefs")
        .each()
        .map_to(
            table="t",
            fields=[
                ref["Field"]("uid", r_gfp("id")),
                ref["Field"]("k", r_key()),
                ref["Field"]("v", ref["node"]()),
            ],
        )
        .run()
    )
    s = (
        etl(data, spark=spark)
        .goto("users")
        .each()
        .goto("prefs")
        .each()
        .map_to(
            "t",
            fields=[
                Field("uid", get_from_parent("id")),
                Field("k", s_key()),
                Field("v", node()),
            ],
        )
        .run()
    )
    ref_rows = list(r.tables["t"].values()) if "t" in r.tables else []
    got_rows = s.rows("t") if "t" in s.tables else []
    # exact row COUNT (phantom (k, NULL) entries would inflate it even
    # when None-dropping normalization hides them)
    assert len(got_rows) == len(ref_rows), f"seed={seed}"
    assert norm_rows(dict(x) for x in ref_rows) == norm_rows(got_rows), f"seed={seed}"


def test_differential_dict_insertion_order(spark):
    """Dict iteration follows insertion order, not schema/alpha order."""
    ref = _load_reference()
    from etielle_spark import Field, etl, key as s_key, node

    from etielle.transforms import key as r_key

    data = {"m": {"zeta": 1, "alpha": 2, "mid": 3}}
    r = (
        ref["etl"](data)
        .goto("m")
        .each()
        .map_to(
            table="t",
            fields=[ref["Field"]("k", r_key()), ref["Field"]("v", ref["node"]())],
        )
        .run()
    )
    s = (
        etl(data, spark=spark)
        .goto("m")
        .each()
        .map_to("t", fields=[Field("k", s_key()), Field("v", node())])
        .run()
    )
    want = [dict(x)["k"] for x in r.tables["t"].values()]
    got = [x["k"] for x in s.rows("t", ordered=True)]
    assert got == want == ["zeta", "alpha", "mid"]


@pytest.mark.parametrize("seed", range(4))
def test_differential_len_of_dicts(spark, seed):
    """len_of over dict nodes: per-row key count, {} -> 0, even when
    sibling dicts union to a wider schema."""
    ref = _load_reference()
    from etielle_spark import Field, etl, get, len_of

    from etielle.transforms import len_of as r_len_of, get as r_get

    rng = random.Random(800 + seed)
    keys = ["a", "b", "c", "d"]
    items = []
    for i in range(rng.randint(1, 6)):
        n = rng.randint(0, len(keys))
        items.append({"id": i, "attrs": {k: rng.randint(0, 9) for k in rng.sample(keys, n)}})
    items.append({"id": 99, "attrs": {}})
    data = {"items": items}

    r = (
        ref["etl"](data)
        .goto("items")
        .each()
        .map_to(
            table="t",
            fields=[
                ref["Field"]("id", r_get("id")),
                ref["Field"]("n", r_len_of(r_get("attrs"))),
            ],
        )
        .run()
    )
    s = (
        etl(data, spark=spark)
        .goto("items")
        .each()
        .map_to(
            "t",
            fields=[Field("id", get("id")), Field("n", len_of(get("attrs")))],
        )
        .run()
    )
    want = ref_tables(ref, r, "t")
    got = norm_rows(s.rows("t"))
    assert got == want, f"seed={seed}"


@pytest.mark.parametrize("seed", range(6))
def test_differential_paths_through_mixed_kind_elements(spark, seed):
    """Round-3 fix (resolve_path variant unwrap after array/map element
    access): paths like a.0.x and m.k.x where the ELEMENT kind varies
    across siblings — verified against the reference's own executor on
    seeded-random shapes."""
    ref = _load_reference()
    from etielle_spark import Field, etl, get

    from etielle.transforms import get as r_get

    rng = random.Random(4200 + seed)
    docs = []
    for i in range(rng.randint(2, 8)):
        kind = rng.choice(["structs", "scalars", "mixed", "none"])
        if kind == "structs":
            a = [{"x": rng.randint(0, 99)} for _ in range(rng.randint(1, 3))]
        elif kind == "scalars":
            a = [rng.randint(0, 99) for _ in range(rng.randint(1, 3))]
        elif kind == "mixed":
            a = [{"x": rng.randint(0, 99)}, rng.randint(0, 99)]
        else:
            a = None
        m_kind = rng.choice(["struct", "scalar", "absent"])
        doc = {"id": i, "a": a}
        if m_kind == "struct":
            doc["m"] = {"k": {"x": rng.randint(0, 99)}}
        elif m_kind == "scalar":
            doc["m"] = {"k": rng.randint(0, 99)}
        docs.append(doc)
    data = {"docs": docs}

    def fields(F_, g):
        return [
            F_("id", g("id")),
            F_("ax", g(["a", 0, "x"])),
            F_("a0", g(["a", 0])),
            F_("mkx", g("m.k.x")),
        ]

    r = (
        ref["etl"](data)
        .goto("docs")
        .each()
        .map_to(table="t", fields=fields(ref["Field"], r_get))
        .run()
    )
    s = (
        etl(data, spark=spark)
        .goto("docs")
        .each()
        .map_to("t", fields=fields(Field, get))
        .run()
    )
    want = ref_tables(ref, r, "t")
    got = norm_rows(s.rows("t"))
    assert got == want, f"seed={seed}\nwant={want}\ngot={got}"
