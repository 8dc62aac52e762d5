"""End-to-end streaming ETL: readStream -> foreachBatch -> fluent pipeline
-> ParquetSink; plus plan-quality regression guards (pushdown/broadcast)."""

import shutil
import tempfile

from pyspark.sql import functions as F

from etielle_spark import Field, etl, get
from etielle_spark.sources import ParquetSink
from etielle_spark.streaming import for_each_batch


def test_foreachbatch_pipeline_to_parquet(spark):
    src_dir = tempfile.mkdtemp(prefix="fb_src_")
    out_dir = tempfile.mkdtemp(prefix="fb_out_")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet").limit(
        200
    ).write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    def pipeline(batch_df, batch_id):
        result = (
            etl(batch_df, spark=spark)
            .map_to(
                "order_rows",
                fields=[
                    Field("okey", get("o_orderkey")),
                    Field("status", get("o_orderstatus")),
                    Field("price", get("o_totalprice")),
                ],
                join_on=["okey"],
            )
            .run()
        )
        return result.tables

    q = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .writeStream.foreachBatch(
            for_each_batch(pipeline, ParquetSink(out_dir, mode="append"))
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    back = spark.read.parquet(f"{out_dir}/order_rows")
    assert back.count() == 200
    assert set(back.columns) == {"id", "okey", "status", "price"}


def test_plan_quality_pushdown_and_broadcast(spark):
    """Regression guard: filters reach the parquet scan and dimension
    joins broadcast in the compiled plans."""
    from etielle_spark.benchqueries import QUERIES

    plan = (
        QUERIES["q05_supplier_volume"][0](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull" in plan

    # engine-compiled path: nested-schema pruning through the struct(*) root
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = (
        etl(li, spark=spark)
        .map_to(
            "t",
            fields=[Field("okey", get("l_orderkey")), Field("qty", get("l_quantity"))],
            join_on=["okey"],
        )
        .run()["t"]
    )
    plan2 = out._jdf.queryExecution().executedPlan().toString()
    assert "l_extendedprice" not in plan2  # untouched columns pruned away
    assert "PushedFilters: [IsNotNull(l_orderkey)]" in plan2


def test_plan_quality_scale_paths(spark):
    """The 100 TB paths keep their intended shapes: ANN broadcasts the
    query side with no single-partition exchange; salted_agg is exactly
    two hash exchanges (partial + merge) with no funnel."""
    from etielle_spark.benchqueries import QUERIES

    sf = "/root/testdata/sf0.001"
    ann = (
        QUERIES["q54_ann_lsh_topk"][0](spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in ann
    assert "SinglePartition" not in ann

    salted = (
        QUERIES["q55_salted_agg"][0](spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in salted
    assert salted.count("Exchange ") == 2
