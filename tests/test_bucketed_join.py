"""Bucketed co-located joins: the 100 TB join strategy.

At cluster scale, repeatedly-joined big tables are written bucketed on
the join key (``bucketBy``); Spark then plans SortMergeJoin WITHOUT a
shuffle on either side — the co-location replaces the Exchange.  This
test proves the engine's plans actually get that benefit (no Exchange
above either scan), which is what makes orders x lineitem joins viable
when both sides are tens of TB.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark):
    d = tempfile.mkdtemp(prefix="bucketed_wh_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, warehouse):
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")

    from etielle_spark.plans import bucket_layout

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    bucket_layout(
        orders, "b_orders", ["o_orderkey"], num_buckets=8,
        sort_by=["o_orderkey"], path=f"{warehouse}/b_orders",
    )
    bucket_layout(
        lineitem, "b_lineitem", ["l_orderkey"], num_buckets=8,
        sort_by=["l_orderkey"], path=f"{warehouse}/b_lineitem",
    )

    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    # at sf0.001 both sides fit in broadcast range, which would bypass the
    # thing under test; at real scale neither side broadcasts — force the
    # big-big plan
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            bo.join(bl, bo["o_orderkey"] == bl["l_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the join itself must not shuffle either bucketed side: the only
    # allowed Exchange is the post-join aggregation shuffle
    join_section = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan

    # and the answer matches the unbucketed plan
    plain = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    assert (
        joined.exceptAll(plain).count() + plain.exceptAll(joined).count() == 0
    )
