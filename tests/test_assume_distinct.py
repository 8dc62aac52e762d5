"""assume_distinct hint (VERDICT r9 item #3): caller-asserted key
distinctness skips the keyed LWW merge Catalyst can't prove away."""

import pytest

from etielle_spark import Field, TempField, etl
from etielle_spark import fluent
from etielle_spark.policies import AppendPolicy
from etielle_spark.transforms import get


def _rows(result, table):
    return sorted(
        tuple(r[c] for c in sorted(r.asDict())) for r in result[table].collect()
    )


def test_hint_on_equals_hint_off_on_distinct_data(spark):
    """Differential: same pipeline with and without the hint on
    genuinely-distinct keys — identical rows."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )

    def build(hint):
        return (
            etl(df, spark=spark)
            .map_to(
                "t",
                fields=[Field("k", get("k")), Field("v", get("v"))],
                join_on=["k"],
                assume_distinct=hint,
            )
            .run()
        )

    assert _rows(build(False), "t") == _rows(build(True), "t")


def test_hint_skips_the_merge_aggregate(spark):
    """The point of the hint: no aggregate in the physical plan for the
    hinted emission (the unhinted plan has one — raw-source keys are
    unprovable)."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")

    def plan(hint):
        res = (
            etl(df, spark=spark)
            .map_to(
                "t",
                fields=[Field("k", get("k")), Field("v", get("v"))],
                join_on=["k"],
                assume_distinct=hint,
            )
            .run()
        )
        return res["t"]._jdf.queryExecution().executedPlan().toString()

    assert "Aggregate" in plan(False)
    assert "Aggregate" not in plan(True)


def test_violated_hint_passes_duplicates_through(spark):
    """Documented contract: duplicate keys under the hint are NOT merged
    (last-write-wins is not applied) — both rows surface."""
    df = spark.createDataFrame(
        [(1, "first"), (1, "second"), (2, "only")], "k long, v string"
    )
    res = (
        etl(df, spark=spark)
        .map_to(
            "t",
            fields=[Field("k", get("k")), Field("v", get("v"))],
            join_on=["k"],
            assume_distinct=True,
        )
        .run()
    )
    rows = res["t"].collect()
    assert len(rows) == 3  # un-merged; hint-off would LWW down to 2
    assert sorted(r["v"] for r in rows if r["k"] == 1) == ["first", "second"]


def test_debug_mode_raises_on_violated_hint(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b")], "k long, v string")
    old = fluent._VERIFY_DISTINCT_HINTS
    fluent._VERIFY_DISTINCT_HINTS = True
    try:
        with pytest.raises(ValueError, match="assume_distinct violated"):
            (
                etl(df, spark=spark)
                .map_to(
                    "t",
                    fields=[Field("k", get("k")), Field("v", get("v"))],
                    join_on=["k"],
                    assume_distinct=True,
                )
                .run()
            )
    finally:
        fluent._VERIFY_DISTINCT_HINTS = old


def test_debug_mode_passes_on_honest_hint(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    old = fluent._VERIFY_DISTINCT_HINTS
    fluent._VERIFY_DISTINCT_HINTS = True
    try:
        res = (
            etl(df, spark=spark)
            .map_to(
                "t",
                fields=[Field("k", get("k")), Field("v", get("v"))],
                join_on=["k"],
                assume_distinct=True,
            )
            .run()
        )
        assert res["t"].count() == 2
    finally:
        fluent._VERIFY_DISTINCT_HINTS = old


def test_hint_does_not_bypass_merge_policies(spark):
    """AppendPolicy wraps even single rows in lists — the merge is not
    an identity, so a policy table still aggregates despite the hint."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    res = (
        etl(df, spark=spark)
        .map_to(
            "t",
            fields=[Field("k", get("k")), Field("v", get("v"), merge=AppendPolicy())],
            join_on=["k"],
            assume_distinct=True,
        )
        .run()
    )
    rows = {r["k"]: r["v"] for r in res["t"].collect()}
    assert rows == {1: ["a"], 2: ["b"]}


def test_hint_keeps_schema_validation_and_error_channel(spark):
    """The skip only removes the merge AGGREGATION — schema casting,
    the errors channel, and id injection all run downstream and must
    behave identically with and without the hint."""
    df = spark.createDataFrame([(1, "12"), (2, "x")], "k long, v string")

    def build(hint):
        return (
            etl(df, spark=spark, errors="collect")
            .map_to(
                "t",
                fields=[Field("k", get("k")), Field("v", get("v"))],
                join_on=["k"],
                schema="k bigint, v int",
                assume_distinct=hint,
            )
            .run()
        )

    off, on = build(False), build(True)
    assert sorted((r["k"], r["v"]) for r in off["t"].collect()) == sorted(
        (r["k"], r["v"]) for r in on["t"].collect()
    ) == [(1, 12)]
    assert off["t"].schema == on["t"].schema
    assert off.errors["t"].count() == on.errors["t"].count() == 1


def test_hint_requires_join_on(spark):
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    with pytest.raises(ValueError, match="assume_distinct requires join_on"):
        etl(df, spark=spark).map_to(
            "t",
            fields=[Field("k", get("k")), Field("v", get("v"))],
            assume_distinct=True,
        )


def test_null_empty_key_filter_still_applies_under_hint(spark):
    """Reference semantics (0-valid / ""-skipped rows) are key-filter
    behavior, not merge behavior — the hint must not disable them."""
    df = spark.createDataFrame(
        [(None, "x"), (1, "a")], "k long, v string"
    )
    res = (
        etl(df, spark=spark)
        .map_to(
            "t",
            fields=[Field("k", get("k")), Field("v", get("v"))],
            join_on=["k"],
            assume_distinct=True,
        )
        .run()
    )
    assert [r["k"] for r in res["t"].collect()] == [1]
