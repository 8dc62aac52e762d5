"""Skew-aware salted aggregation (plans/skew.py)."""

from pyspark.sql import functions as F

from etielle_spark.plans import salted_agg


def test_salted_agg_matches_plain(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    got = salted_agg(
        li,
        ["l_returnflag"],
        {
            "qty": ("l_quantity", "sum"),
            "n": ("*", "count"),
            "lo": ("l_extendedprice", "min"),
            "hi": ("l_extendedprice", "max"),
        },
        salt=8,
    )
    want = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("qty"),
        F.count("*").alias("n"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    g = {r["l_returnflag"]: (round(r["qty"], 4), r["n"], r["lo"], r["hi"]) for r in got.collect()}
    w = {r["l_returnflag"]: (round(r["qty"], 4), r["n"], r["lo"], r["hi"]) for r in want.collect()}
    assert g == w


def test_salted_agg_rejects_non_algebraic(spark):
    import pytest

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(li, ["l_returnflag"], {"xs": ("l_quantity", "collect_list")})
