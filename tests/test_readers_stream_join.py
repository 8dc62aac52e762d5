"""Multi-format readers, partitioned writer, and the watermarked
stream-stream interval join (streaming output checked against the batch
oracle of the same plan)."""

import datetime
import os

import pytest
from pyspark.sql import functions as F, types as T

from etielle_spark.sources.readers import (
    infer_schema_once,
    read_table,
    write_partitioned,
)
from etielle_spark.streaming.joins import interval_join


def test_read_csv_requires_schema(spark, tmp_path):
    p = str(tmp_path / "c")
    spark.range(3).write.mode("overwrite").csv(p, header=True)
    with pytest.raises(ValueError, match="schema"):
        read_table(spark, p, format="csv")
    schema = T.StructType([T.StructField("id", T.LongType())])
    df = read_table(spark, p, format="csv", schema=schema)
    assert sorted(r.id for r in df.collect()) == [0, 1, 2]


def test_infer_schema_once_then_pin(spark, tmp_path):
    p = str(tmp_path / "c2")
    spark.createDataFrame([(1, "a"), (2, "b")], ["n", "s"]).write.mode(
        "overwrite"
    ).csv(p, header=True)
    schema = infer_schema_once(spark, p, format="csv")
    names = [f.name for f in schema.fields]
    assert names == ["n", "s"]
    df = read_table(spark, p, format="csv", schema=schema)
    assert df.count() == 2


def test_read_json_and_text(spark, tmp_path):
    pj = str(tmp_path / "j")
    spark.createDataFrame([(1, "x")], ["a", "b"]).write.mode("overwrite").json(pj)
    schema = "a bigint, b string"
    assert read_table(spark, pj, format="json", schema=schema).count() == 1
    pt = str(tmp_path / "t")
    spark.createDataFrame([("hello",), ("world",)], ["value"]).write.mode(
        "overwrite"
    ).text(pt)
    assert read_table(spark, pt, format="text").count() == 2


def test_read_rejects_unknown_format(spark):
    with pytest.raises(ValueError, match="unsupported format"):
        read_table(spark, "/nowhere", format="avro")


def test_write_partitioned_layout_and_pruning(spark, tmp_path):
    p = str(tmp_path / "out")
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", i * 10) for i in range(100)],
        ["id", "part", "v"],
    )
    write_partitioned(
        df, p, partition_by=["part"], sort_by=["v"], max_records_per_file=20
    )
    assert os.path.isdir(os.path.join(p, "part=a"))
    back = spark.read.parquet(p)
    assert back.count() == 100
    # partition pruning visible in the plan
    plan = (
        back.filter(F.col("part") == "a")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert back.filter(F.col("part") == "a").count() == 50
    # bounded file sizes: 50 rows per partition / 20 -> >= 3 files
    files = [
        f
        for f in os.listdir(os.path.join(p, "part=a"))
        if f.endswith(".parquet")
    ]
    assert len(files) >= 3


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 12, minute, second)


def _pairs(spark):
    clicks = spark.createDataFrame(
        [(1, _ts(0), "c1"), (1, _ts(20), "c2"), (2, _ts(5), "c3")],
        ["user", "cts", "click_id"],
    )
    buys = spark.createDataFrame(
        [(1, _ts(4), 10.0), (1, _ts(40), 20.0), (2, _ts(30), 5.0)],
        ["user", "bts", "amount"],
    )
    return clicks, buys


def test_interval_join_batch_semantics(spark):
    clicks, buys = _pairs(spark)
    out = interval_join(
        clicks,
        buys,
        ["user"],
        left_ts="cts",
        right_ts="bts",
        lower="0 minutes",
        upper="10 minutes",
    ).collect()
    got = {(r.user, r.click_id, r.amount) for r in out}
    # c1 at :00 matches buy :04; c2 at :20 matches nothing (buy :40 > +10m);
    # c3 at :05 matches nothing (buy :30 > +10m)
    assert got == {(1, "c1", 10.0)}


def test_interval_join_requires_watermarks_for_streams(spark, tmp_path):
    p = str(tmp_path / "s")
    clicks, _ = _pairs(spark)
    clicks.write.mode("overwrite").parquet(p)
    stream = spark.readStream.schema(clicks.schema).parquet(p)
    with pytest.raises(ValueError, match="watermark"):
        interval_join(
            stream,
            stream.withColumnRenamed("cts", "bts").withColumnRenamed(
                "click_id", "click_id2"
            ),
            ["user"],
            left_ts="cts",
            right_ts="bts",
            lower="0 minutes",
            upper="10 minutes",
        )


def test_interval_join_stream_stream_matches_batch(spark, tmp_path):
    clicks, buys = _pairs(spark)
    pc, pb = str(tmp_path / "clicks"), str(tmp_path / "buys")
    clicks.write.mode("overwrite").parquet(pc)
    buys.write.mode("overwrite").parquet(pb)
    sc = spark.readStream.schema(clicks.schema).parquet(pc)
    sb = spark.readStream.schema(buys.schema).parquet(pb)
    joined = interval_join(
        sc,
        sb,
        ["user"],
        left_ts="cts",
        right_ts="bts",
        lower="0 minutes",
        upper="10 minutes",
        left_watermark="1 hour",
        right_watermark="1 hour",
    )
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user, r.click_id, r.amount)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {(1, "c1", 10.0)}


def test_read_write_orc_roundtrip(spark, tmp_path):
    """ORC is first-class next to parquet: write via write_partitioned,
    read back via read_table, predicate pushdown visible in the plan."""
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("k"), (F.col("id") * 2.0).alias("v")
    )
    path = str(tmp_path / "orc_tbl")
    write_partitioned(df, path, format="orc", partition_by=["k"])
    back = read_table(spark, path, format="orc")
    assert back.count() == 100
    pruned = back.filter(F.col("k") == 3)
    assert pruned.count() == 20
    # partition pruning: the k=3 predicate lands in PartitionFilters
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "k" in plan
