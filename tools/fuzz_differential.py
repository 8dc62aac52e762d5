"""Extended differential fuzz campaign against the reference executor.

Runs the same pipeline shapes as tests/test_differential_reference.py but
over many more seeds (the pytest suite keeps a small fixed set for CI
speed).  Usage:

    python tools/fuzz_differential.py [n_seeds_per_shape]

Mixed-kind sibling values (the same field carrying array/struct/scalar
kinds across siblings) unify as VariantType since round 2, so the
blob-walk shape is expected to run mismatch-free.
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")


def canon(v):
    """Order-insensitive repr: dicts render with sorted keys (Python dict
    equality ignores insertion order; Spark struct fields are schema-ordered,
    so per-row insertion order is not representable — nor semantically
    required for dict-valued results)."""
    if isinstance(v, dict):
        return "{" + ", ".join(f"{k!r}: {canon(x)}" for k, x in sorted(v.items(), key=lambda kv: str(kv[0]))) + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(canon(x) for x in v) + "]"
    return str(v)


def norm_rows(rows):
    out = set()
    for r in rows:
        out.add(tuple(sorted((k, str(v)) for k, v in r.items() if v is not None)))
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25

    from etielle.fluent import Field as RF
    from etielle.fluent import TempField as RTF
    from etielle.fluent import etl as retl
    from etielle.fluent import node as rnode
    from etielle.instances import AddPolicy as RAdd, AppendPolicy as RApp
    from etielle.transforms import get as rget, key as rkey
    from etielle.transforms import get_from_parent as rgfp

    from etielle_spark import (
        AddPolicy,
        AppendPolicy,
        Field,
        TempField,
        etl,
        get,
        get_from_parent,
        key,
        node,
    )
    from etielle_spark.session import get_spark

    spark = get_spark("fuzz", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    def rand_value(rng, depth=0):
        r = rng.random()
        if depth > 2 or r < 0.25:
            return rng.choice([None, "", "s", 7, -1, "x y"])
        if r < 0.5:
            return [rand_value(rng, depth + 1) for _ in range(rng.randint(0, 3))]
        return {
            rng.choice(["a", "b", "c"]): rand_value(rng, depth + 1)
            for _ in range(rng.randint(0, 3))
        }

    failures = []

    def check(shape, seed, want, got):
        if want != got:
            failures.append((shape, seed))
            print(f"[MISMATCH] {shape} seed={seed}")
            print("  ref :", sorted(want)[:4])
            print("  mine:", sorted(got)[:4])

    for seed in range(n):
        rng = random.Random(seed)
        # shape 1: nested users/posts with messy fields
        users = []
        for i in range(rng.randint(0, 6)):
            u = {"id": f"u{i}"}
            if rng.random() < 0.8:
                u["name"] = rng.choice(["ann", None, ""])
            if rng.random() < 0.7:
                u["posts"] = [
                    {"id": f"p{i}_{j}", "t": rng.choice(["x", None])}
                    for j in range(rng.randint(0, 3))
                ]
            users.append(u)
        data = {"users": users}
        r = (
            retl(data)
            .goto("users").each()
            .map_to(table="u", fields=[RF("id", rget("id")), RF("name", rget("name"))])
            .goto("posts").each()
            .map_to(table="p", fields=[RF("id", rget("id")), RF("uid", rgfp("id")), RF("t", rget("t"))])
            .run()
        )
        s = (
            etl(data, spark=spark)
            .goto("users").each()
            .map_to("u", fields=[Field("id", get("id")), Field("name", get("name"))])
            .goto("posts").each()
            .map_to("p", fields=[Field("id", get("id")), Field("uid", get_from_parent("id")), Field("t", get("t"))])
            .run()
        )
        for tbl in ("u", "p"):
            want = norm_rows(dict(x) for x in r.tables[tbl].values()) if tbl in r.tables else set()
            got = norm_rows(s.rows(tbl)) if tbl in s.tables else set()
            check(f"nested/{tbl}", seed, want, got)

        # shape 2: keyed merge with policies and dirty keys
        rng2 = random.Random(1000 + seed)
        evs = [
            {
                "k": rng2.choice(["a", "b", "", None]),
                "n": rng2.choice([1, 2, None]),
                "tag": rng2.choice(["t", None]),
            }
            for _ in range(rng2.randint(0, 12))
        ]
        data2 = {"evs": evs}
        r2 = (
            retl(data2)
            .goto("evs").each()
            .map_to(
                table="t",
                fields=[RF("k", rget("k")), RF("n", rget("n"), merge=RAdd()), RF("tags", rget("tag"), merge=RApp())],
                join_on=["k"],
            )
            .run()
        )
        s2 = (
            etl(data2, spark=spark)
            .goto("evs").each()
            .map_to(
                "t",
                fields=[Field("k", get("k")), Field("n", get("n"), merge=AddPolicy()), Field("tags", get("tag"), merge=AppendPolicy())],
                join_on=["k"],
            )
            .run()
        )
        want2 = set()
        if "t" in r2.tables:
            for row in r2.tables["t"].values():
                d = dict(row)
                want2.add((d["k"], d.get("n"), tuple(d.get("tags") or ())))
        got2 = set()
        if "t" in s2.tables:
            for d in s2.rows("t"):
                got2.add((d["k"], d["n"], tuple(d["tags"] or ())))
        check("policies", seed, want2, got2)

        # shape 3: random nested blob — parity contract: iterated entry
        # keys + scalar get() access (raw node() representations
        # legitimately differ: ragged python vs schema-unified structs)
        rng3 = random.Random(2000 + seed)
        blob = {"root": {f"k{i}": rand_value(rng3, 0) for i in range(rng3.randint(0, 4))}}
        r3 = (
            retl(blob)
            .goto("root").each()
            .map_to(table="t", fields=[RF("k", rkey()), RF("a", rget("a")), RF("ab", rget("a.b"))])
            .run()
        )
        s3 = (
            etl(blob, spark=spark)
            .goto("root").each()
            .map_to("t", fields=[Field("k", key()), Field("a", get("a")), Field("ab", get("a.b"))])
            .run()
        )

        def scalar_or_skip(v):
            return v if isinstance(v, (str, int, float, bool, type(None))) else "__nonscalar__"

        want3 = set()
        if "t" in r3.tables:
            for row in r3.tables["t"].values():
                d = dict(row)
                want3.add((d["k"], scalar_or_skip(d.get("a")), scalar_or_skip(d.get("ab"))))
        got3 = set()
        if "t" in s3.tables:
            for d in s3.rows("t"):
                got3.add((d["k"], scalar_or_skip(d.get("a")), scalar_or_skip(d.get("ab"))))
        check("blob-walk", seed, want3, got3)

        # shape 4: sibling dicts with differing key sets (presence markers)
        rng4 = random.Random(3000 + seed)
        keysets = [["a"], ["b"], ["a", "c"], ["d", "b"], [], ["e", "a"]]
        users4 = []
        for i in range(rng4.randint(1, 6)):
            prefs = {k: rng4.randint(0, 9) for k in rng4.choice(keysets)}
            users4.append({"id": f"u{i}", "prefs": prefs})
        data4 = {"users": users4}
        r4 = (
            retl(data4)
            .goto("users").each().goto("prefs").each()
            .map_to(table="t", fields=[RF("uid", rgfp("id")), RF("k", rkey()), RF("v", rnode())])
            .run()
        )
        s4 = (
            etl(data4, spark=spark)
            .goto("users").each().goto("prefs").each()
            .map_to("t", fields=[Field("uid", get_from_parent("id")), Field("k", key()), Field("v", node())])
            .run()
        )
        ref_rows4 = list(r4.tables["t"].values()) if "t" in r4.tables else []
        got_rows4 = s4.rows("t") if "t" in s4.tables else []
        if len(ref_rows4) != len(got_rows4):
            failures.append(("sibling-dicts-count", seed))
            print(f"[MISMATCH] sibling-dicts-count seed={seed}: ref {len(ref_rows4)} vs {len(got_rows4)}")
        else:
            check("sibling-dicts", seed,
                  norm_rows(dict(x) for x in ref_rows4), norm_rows(got_rows4))

        # shape 5: mixed-kind sibling values (variant unification) — the
        # field 'a' carries scalar/array/dict kinds across siblings; the
        # VALUE itself must round-trip (not just scalar-or-skip)
        rng5 = random.Random(4000 + seed)
        entries5 = {}
        for i in range(rng5.randint(1, 5)):
            kind = rng5.random()
            if kind < 0.34:
                a = rng5.choice([7, "s", None])
            elif kind < 0.67:
                a = [rng5.randint(0, 3) for _ in range(rng5.randint(0, 3))]
            else:
                a = {"b": rng5.randint(0, 9)}
            entries5[f"k{i}"] = {"a": a}
        data5 = {"root": entries5}
        r5 = (
            retl(data5)
            .goto("root").each()
            .map_to(table="t", fields=[RF("k", rkey()), RF("a", rget("a")), RF("ab", rget("a.b"))])
            .run()
        )
        s5 = (
            etl(data5, spark=spark)
            .goto("root").each()
            .map_to("t", fields=[Field("k", key()), Field("a", get("a")), Field("ab", get("a.b"))])
            .run()
        )
        want5 = set()
        if "t" in r5.tables:
            for row in r5.tables["t"].values():
                d = dict(row)
                want5.add((d["k"], str(d.get("a")), str(d.get("ab"))))
        got5 = set()
        if "t" in s5.tables:
            for d in s5.rows("t"):
                got5.add((d["k"], str(d.get("a")), str(d.get("ab"))))
        check("variant-mixed", seed, want5, got5)

        # shape 6: each() DIRECTLY over the kind-mixed field — per-row
        # dispatch (array rows iterate with index, dict rows with key,
        # scalars single, None skipped) must match the reference executor
        r6 = (
            retl(data5)
            .goto("root").each().goto("a").each()
            .map_to(table="v", fields=[
                RF("pk", rkey()),
                RF("v", rnode()),
            ])
            .run()
        )
        s6 = (
            etl(data5, spark=spark)
            .goto("root").each().goto("a").each()
            .map_to("v", fields=[Field("pk", key()), Field("v", node())])
            .run()
        )
        want6 = set()
        if "v" in r6.tables:
            for row in r6.tables["v"].values():
                d = dict(row)
                want6.add((str(d.get("pk")), str(d.get("v"))))
        got6 = set()
        if "v" in s6.tables:
            for d in s6.rows("v"):
                got6.add((str(d.get("pk")), str(d.get("v"))))
        check("variant-each", seed, want6, got6)

        # shape 8 (round 3): integer/key segment paths THROUGH kind-mixed
        # containers — resolve_path must unwrap variant wrappers after
        # array and map element access, not only at struct fields
        rng8 = random.Random(8000 + seed)
        docs8 = []
        for i in range(rng8.randint(1, 7)):
            docs8.append(
                {
                    "id": i,
                    "a": rand_value(rng8),
                    "m": rng8.choice(
                        [
                            None,
                            {"k": rand_value(rng8)},
                            {"k": {"x": rng8.randint(0, 9)}},
                        ]
                    ),
                }
            )
        data8 = {"docs": docs8}
        fields8 = [
            ("id", lambda g: g("id")),
            ("a0x", lambda g: g(["a", 0, "x"])),
            ("a1", lambda g: g(["a", 1])),
            ("mkx", lambda g: g("m.k.x")),
        ]
        r8 = (
            retl(data8)
            .goto("docs").each()
            .map_to(table="t", fields=[RF(nm, fn(rget)) for nm, fn in fields8])
            .run()
        )
        s8 = (
            etl(data8, spark=spark)
            .goto("docs").each()
            .map_to("t", fields=[Field(nm, fn(get)) for nm, fn in fields8])
            .run()
        )
        want8 = set()
        if "t" in r8.tables:
            for row in r8.tables["t"].values():
                d = dict(row)
                want8.add(tuple(canon(d.get(nm)) for nm, _ in fields8))
        got8 = set()
        if "t" in s8.tables:
            for d in s8.rows("t"):
                got8.add(tuple(canon(d.get(nm)) for nm, _ in fields8))
        check("variant-path-segments", seed, want8, got8)

        # shape 9 (round 3): build_index(from_dict) + lookup with messy
        # keys (string/int mixes, empty strings, missing keys, defaults)
        from etielle.transforms import lookup as rlookup

        from etielle_spark import lookup as slookup

        rng9 = random.Random(9000 + seed)
        keypool = ["a", "b", "7", 7, "x y", "", "zz"]
        idx = {
            k: rng9.choice(["V1", 3, None, "V2"])
            for k in rng9.sample(keypool, rng9.randint(1, len(keypool)))
        }
        docs9 = [
            {"id": i, "k": rng9.choice(keypool + [None, "missing"])}
            for i in range(rng9.randint(1, 8))
        ]
        data9 = {"docs": docs9}
        r9 = (
            retl(data9)
            .build_index("m", from_dict=idx)
            .goto("docs").each()
            .map_to(table="t", fields=[
                RF("id", rget("id")),
                RF("v", rlookup("m", rget("k"), default="DFLT")),
            ])
            .run()
        )
        s9 = (
            etl(data9, spark=spark)
            .build_index("m", from_dict=idx)
            .goto("docs").each()
            .map_to("t", fields=[
                Field("id", get("id")),
                Field("v", slookup("m", get("k"), default="DFLT")),
            ])
            .run()
        )
        want9 = set()
        if "t" in r9.tables:
            for row in r9.tables["t"].values():
                d = dict(row)
                want9.add((canon(d.get("id")), canon(d.get("v"))))
        got9 = set()
        if "t" in s9.tables:
            for d in s9.rows("t"):
                got9.add((canon(d.get("id")), canon(d.get("v"))))
        check("lookup-index", seed, want9, got9)

        # shape 10 (round 6): backlink — parent id-lists with missing /
        # duplicated / None ids, empty lists, absent children.  The
        # reference binds via setattr on INSTANCES (dicts silently don't
        # bind — its own tests use dataclasses), so the reference side
        # mirrors its test_backlink_sets_list_attribute shape; children
        # are compared as ORDER-SENSITIVE text lists (id-list order).
        from dataclasses import dataclass as _dc, field as _dcfield

        @_dc
        class _RQ:
            __tablename__ = "q"
            qid: str = ""
            children: list = _dcfield(default_factory=list)

        @_dc
        class _RC:
            __tablename__ = "c"
            t: str = ""

        rng10 = random.Random(10_000 + seed)
        cid_pool = [f"c{j}" for j in range(6)]
        qs10 = [
            {
                "qid": f"q{i}",
                "cids": [
                    rng10.choice(cid_pool + ["missing", None])
                    for _ in range(rng10.randint(0, 5))
                ],
            }
            for i in range(rng10.randint(1, 4))
        ]
        cs10 = [
            {"cid": c, "t": f"t{j}"}
            for j, c in enumerate(cid_pool)
            if rng10.random() < 0.8
        ]
        data10 = {"qs": qs10, "cs": cs10}
        r10 = (
            retl(data10)
            .goto("qs").each()
            .map_to(table=_RQ, fields=[RF("qid", rget("qid")), RTF("cids", rget("cids"))])
            .goto_root()
            .goto("cs").each()
            .map_to(table=_RC, fields=[RF("t", rget("t")), RTF("cid", rget("cid"))])
            .backlink(parent=_RQ, child=_RC, attr="children", by={"cids": "cid"})
            .run()
        )
        s10 = (
            etl(data10, spark=spark)
            .goto("qs").each()
            .map_to("q", fields=[Field("qid", get("qid")), TempField("cids", get("cids"))],
                    join_on=["qid"])
            .goto_root()
            .goto("cs").each()
            .map_to("c", fields=[Field("t", get("t")), TempField("cid", get("cid"))],
                    join_on=["t"])
            .backlink("q", "c", "children", by={"cids": "cid"})
            .run()
        )
        want10 = set()
        if _RQ in r10.tables:
            for q_obj in r10.tables[_RQ].values():
                want10.add((q_obj.qid, tuple(c.t for c in q_obj.children)))
        got10 = set()
        if "q" in s10.tables:
            for d in s10.rows("q"):
                got10.add((d["qid"], tuple(c["t"] for c in d.get("children") or [])))
        check("backlink", seed, want10, got10)
        # sink-less backlink runs keep their parent cache for the caller;
        # release it deterministically (round-7 API) instead of nuking
        # the whole session cache
        s10.release()

        # shape 11 (round 7): TWO emissions merging into ONE keyed table
        # with Min/Max/FirstNonNull/default-LWW fields, dirty keys, and
        # explicit Nones — the cross-emission traversal-order semantics
        # (xs rows arrive before ys rows; LWW explicit-None overwrites;
        # FirstNonNull keeps the earliest non-null across BOTH emissions)
        from etielle.instances import (
            FirstNonNullPolicy as RFnn,
            MaxPolicy as RMaxP,
            MinPolicy as RMinP,
        )

        from etielle_spark import FirstNonNullPolicy, MaxPolicy, MinPolicy

        rng11 = random.Random(11_000 + seed)

        def _row11():
            return {
                "k": rng11.choice(["a", "b", "c", None, ""]),
                "v": rng11.choice([1, 2, 3, None]),
                "w": rng11.choice(["p", "q", None]),
                "z": rng11.choice([10, 20, None]),
            }

        data11 = {
            "xs": [_row11() for _ in range(rng11.randint(0, 8))],
            "ys": [_row11() for _ in range(rng11.randint(0, 8))],
        }

        def _fields11(FieldCls, getter, mn, mx, fnn):
            return [
                FieldCls("k", getter("k")),
                FieldCls("mn", getter("v"), merge=mn()),
                FieldCls("mx", getter("z"), merge=mx()),
                FieldCls("fnn", getter("w"), merge=fnn()),
                FieldCls("last", getter("v")),
            ]

        r11 = (
            retl(data11)
            .goto("xs").each()
            .map_to(table="m", fields=_fields11(RF, rget, RMinP, RMaxP, RFnn),
                    join_on=["k"])
            .goto_root()
            .goto("ys").each()
            .map_to(table="m", fields=_fields11(RF, rget, RMinP, RMaxP, RFnn),
                    join_on=["k"])
            .run()
        )
        s11 = (
            etl(data11, spark=spark)
            .goto("xs").each()
            .map_to("m", fields=_fields11(Field, get, MinPolicy, MaxPolicy,
                                          FirstNonNullPolicy), join_on=["k"])
            .goto_root()
            .goto("ys").each()
            .map_to("m", fields=_fields11(Field, get, MinPolicy, MaxPolicy,
                                          FirstNonNullPolicy), join_on=["k"])
            .run()
        )
        want11 = set()
        if "m" in r11.tables:
            for row in r11.tables["m"].values():
                d = dict(row)
                want11.add((d["k"], d.get("mn"), d.get("mx"), d.get("fnn"),
                            d.get("last")))
        got11 = set()
        if "m" in s11.tables:
            for d in s11.rows("m"):
                got11.add((d["k"], d["mn"], d["mx"], d["fnn"], d["last"]))
        check("multi-emission-policies", seed, want11, got11)

    print(f"\nfuzz done: {n} seeds x 11 shapes, {len(failures)} mismatches")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
