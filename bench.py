"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

The headline set covers the scan/agg/join core (q01/q03/q05), the engine
compile path (q04 keyed merge + policies, q11 backlink), windows (q19),
and the training-data operators (q27 minhash, q31 ANN topk, q22 tokens).
Each query is executed to completion (count) after a warm-up pass of the
parquet footer reads; wall time includes planning.
"""

from __future__ import annotations

import json
import os
import time

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_supplier_volume",
    "q04_merge_policies",
    "q11_backlink_collect",
    "q12_junction_distinct",
    "q16_window_topk_per_group",
    "q19_tumbling_window",
    "q20_session_windows",
    "q22_token_stats",
    "q26_exact_dedup_docs",
    # q27/q28 run fused below: the LSH banding reuses the persisted
    # signature frame instead of recomputing the shingle+minhash pipeline
    "q30_simhash",
    "q31_cosine_topk",
    "q41_nation_volume_share",
    "q43_returned_customers",
    # the end-to-end curation DAG (exact dedup -> token gate -> split ->
    # dataset card): the flagship composition, one digest-window shuffle
    "q126_curation_pipeline",
]


def minhash_lsh_fused(spark) -> dict[str, float]:
    """q27 + q28 as one pipeline: signatures computed and persisted once
    (q27's wall time), banding + pair join reusing them (q28's wall time).
    This is how a real dedup pipeline runs — the two stages share the
    expensive shingle pass."""
    from pyspark.sql import functions as F

    from etielle_spark.benchqueries import _docs_plus_clones
    from etielle_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    from pyspark import StorageLevel

    docs = _docs_plus_clones(spark, sf_dir)
    # persist + count MATERIALIZES the signature column (a bare count()
    # would let Catalyst prune the whole MinHash expression away — the
    # timing would measure a scan, not the operator); the cached frame is
    # then reused by the LSH stage via signatures=
    t0 = time.perf_counter()
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=8).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sigs.count()
    t_sig = time.perf_counter() - t0

    t0 = time.perf_counter()
    cand = lsh_candidate_pairs(
        docs, "doc_id", "text", num_hashes=8, bands=4, signatures=sigs
    )
    cand.count()
    t_lsh = time.perf_counter() - t0
    sigs.unpersist()
    return {
        "q27_minhash_signatures": round(t_sig, 3),
        "q28_lsh_candidate_pairs": round(t_lsh, 3),
    }


def streaming_events_windows(spark) -> float:
    """Native Structured Streaming at bench scale: the events table as a
    multi-file stream (availableNow, 4 micro-batches), watermarked
    1-minute tumbling windows in append mode to parquet — cross-batch
    window state, late-data handling, exactly-once file sink."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    work = tempfile.mkdtemp(prefix="bench_stream_ev_")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        src = f"{work}/src"
        ev.repartition(8).write.parquet(src)
        schema = spark.read.parquet(src).schema

        t0 = time.perf_counter()
        from etielle_spark.benchqueries import fix_event_ts

        stream = fix_event_ts(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        ).withColumnRenamed("ts", "tss")
        agg = (
            stream.withWatermark("tss", "10 minutes")
            .groupBy(F.window("tss", "1 minute"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
            .select(
                F.col("window.start").alias("window_start"),
                "event_type",
                "n",
                "total",
            )
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", f"{work}/out")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n = spark.read.parquet(f"{work}/out").count()
        dt = time.perf_counter() - t0
        assert n > 0, "streaming produced no closed windows"
        return dt
    finally:
        shutil.rmtree(work, ignore_errors=True)


def streaming_reference_workload(spark) -> float:
    """The reference's streaming-mode benchmark shape (BASELINE.md: 8,000
    users + 8,000 posts through stream().load().run(), 13.1 s published):
    here as readStream -> foreachBatch -> compiled etl pipeline ->
    ParquetSink, 8 micro-batches of 1,000 users."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from etielle_spark import Field, etl, get, get_from_parent
    from etielle_spark.sources import ParquetSink
    from etielle_spark.streaming import for_each_batch

    n = 8000
    work = tempfile.mkdtemp(prefix="bench_stream_ref_")
    try:
        users = spark.range(n).select(
            F.concat(F.lit("u"), F.col("id")).alias("uid"),
            F.concat(F.lit("name-"), F.col("id")).alias("name"),
            F.array(
                F.struct(
                    F.concat(F.lit("p"), F.col("id"), F.lit("_0")).alias("pid"),
                    F.repeat(F.lit("x"), 2048).alias("body"),
                )
            ).alias("posts"),
        )
        src = f"{work}/src"
        users.repartition(8).write.parquet(src)
        schema = spark.read.parquet(src).schema

        def pipeline(batch_df, batch_id):
            result = (
                etl(batch_df, spark=spark)
                .map_to(
                    "users",
                    fields=[Field("id", get("uid")), Field("name", get("name"))],
                    join_on=["id"],
                )
                .goto_root(0)
                .goto("posts")
                .each()
                .map_to(
                    "posts",
                    fields=[
                        Field("id", get("pid")),
                        Field("user_id", get_from_parent("uid")),
                        Field("body", get("body")),
                    ],
                    join_on=["id"],
                )
                .link_to("users", by={"user_id": "id"})
                .run()
            )
            return result.tables

        t0 = time.perf_counter()
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(
                for_each_batch(pipeline, ParquetSink(f"{work}/out", mode="append"))
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wrote = (
            spark.read.parquet(f"{work}/out/users").count()
            + spark.read.parquet(f"{work}/out/posts").count()
        )
        dt = time.perf_counter() - t0
        assert wrote == 2 * n, wrote
        return dt
    finally:
        shutil.rmtree(work, ignore_errors=True)


def reference_workload(spark) -> float:
    """The reference's own benchmark shape (BASELINE.md: 8,000 users +
    8,000 posts with one link_to, 2.4 s resident single-process): the same
    pipeline through this engine's compiled plans.  Returned seconds are
    directly comparable to the published resident wall time."""
    import time as _t

    from pyspark.sql import functions as F

    from etielle_spark import Field, TempField, etl, get, get_from_parent

    n = 8000
    users = spark.range(n).select(
        F.concat(F.lit("u"), F.col("id")).alias("uid"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
        F.array(
            F.struct(
                F.concat(F.lit("p"), F.col("id"), F.lit("_0")).alias("pid"),
                F.repeat(F.lit("x"), 2048).alias("body"),
            )
        ).alias("posts"),
    )
    t0 = _t.perf_counter()
    result = (
        etl(users, spark=spark)
        .map_to(
            "users",
            fields=[Field("id", get("uid")), Field("name", get("name"))],
            join_on=["id"],
        )
        .goto_root(0)
        .goto("posts")
        .each()
        .map_to(
            "posts",
            fields=[
                Field("id", get("pid")),
                Field("user_id", get_from_parent("uid")),
                Field("body", get("body")),
            ],
            join_on=["id"],
        )
        .link_to("users", by={"user_id": "id"})
        .run()
    )
    rows = result["users"].count() + result["posts"].count()
    dt = _t.perf_counter() - t0
    assert rows == 2 * n, rows
    return dt



def streaming_incremental_dedup(spark) -> float:
    """Incremental LSH dedup at bench scale: the documents table streamed
    in micro-batches through foreachBatch; each batch's signatures are
    computed once and probed against the persistent band-digest index of
    every prior batch (streaming/incremental_dedup.py)."""
    import shutil
    import tempfile

    from etielle_spark.streaming.incremental_dedup import IncrementalLSHDedup

    work = tempfile.mkdtemp(prefix="bench_stream_dd_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        src = f"{work}/src"
        docs.repartition(4).write.parquet(src)
        schema = spark.read.parquet(src).schema

        n_pairs = 0
        inc = IncrementalLSHDedup(spark, f"{work}/idx", num_hashes=8, bands=4)

        def sink(pairs, batch_id):
            nonlocal n_pairs
            n_pairs += pairs.count()
            pairs.unpersist()

        t0 = time.perf_counter()
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(inc.attach(sink))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    from pyspark.sql import functions as F

    from etielle_spark.benchqueries import QUERIES
    from etielle_spark.session import get_spark

    spark = get_spark("etielle-spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM + file index so per-query numbers measure the queries,
    # not first-use codegen compilation: one scan + one join/agg/window pass
    # through the same physical operators the headline queries use
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li.join(od, li.l_orderkey == od.o_orderkey).groupBy("l_returnflag").count().count()
    from pyspark.sql import Window as _W

    od.select(
        F.row_number()
        .over(_W.partitionBy("o_custkey").orderBy("o_orderkey"))
        .alias("rn")
    ).filter(F.col("rn") <= 1).count()
    # higher-order-function expressions (minhash fold, simhash bit votes)
    # and the banded-LSH join plan have their own first-use
    # analysis/codegen cost — warm them on a 20-row sample so the
    # headline numbers measure the operators
    from etielle_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        simhash,
    )

    tiny = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20).cache()
    )
    minhash_signatures(tiny, "doc_id", "text", num_hashes=8).count()
    lsh_candidate_pairs(tiny, "doc_id", "text", num_hashes=8, bands=4).count()
    simhash(tiny, "doc_id", "text").count()
    tiny.unpersist()

    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn, _sql = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        times[name] = round(dt, 3)
        total += dt

    for name, dt in minhash_lsh_fused(spark).items():
        times[name] = dt
        total += dt

    ref_dt = reference_workload(spark)
    times["ref_workload_users_posts_8k"] = round(ref_dt, 3)
    total += ref_dt

    # streaming path, reported separately (not part of the batch headline
    # total): native watermarked windows + the reference's streaming-mode
    # workload (13.1 s published baseline, BASELINE.md)
    streaming = {
        "streaming_events_1m_windows": round(streaming_events_windows(spark), 3),
        "streaming_ref_workload_users_posts_8k": round(
            streaming_reference_workload(spark), 3
        ),
        "streaming_incremental_dedup": round(
            streaming_incremental_dedup(spark), 3
        ),
    }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "streaming": streaming,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
