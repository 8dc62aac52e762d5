"""Decompose the bench's streaming rows into sub-step timings.

Times the exact work each bench streaming function does, but with the
phases separated (setup / per-batch / final read), so optimization
targets the measured component instead of the aggregate.  Run at the
bench config:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        python tools/profile_streaming.py [row ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.3f}s")
    return out


def profile_ivf(spark):
    from pyspark.sql import functions as F

    from etielle_spark.streaming.incremental_ann import PersistentIVFIndex

    work = tempfile.mkdtemp(prefix="prof_ivf_")
    try:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        hi = emb.agg(F.max("vec_id")).collect()[0][0]
        cut = int(hi * 0.8)
        step = max(1, (hi - cut) // 4)
        print(f"ivf_lifecycle: n_vec~{hi}, cut={cut}")
        idx = PersistentIVFIndex(spark, f"{work}/ivf", nlist=16)
        t("build", lambda: idx.build(emb.filter(F.col("vec_id") <= cut)))
        for i, lo in enumerate(range(cut + 1, hi + 1, step)):
            t(
                f"add[{i}]",
                lambda lo=lo: idx.add(
                    emb.filter(
                        (F.col("vec_id") > lo - 1)
                        & (F.col("vec_id") <= lo + step - 1)
                    )
                ),
            )
        print(f"  files_per_cell: {sorted(idx.files_per_cell().items())[:4]} ...")
        t(
            "query",
            lambda: idx.query(emb.filter("vec_id < 16"), k=10, nprobe=3).count(),
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def profile_dedup(spark):
    from etielle_spark.streaming.incremental_dedup import IncrementalLSHDedup

    work = tempfile.mkdtemp(prefix="prof_dd_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        src = f"{work}/src"
        docs.repartition(4).write.parquet(src)
        files = sorted(
            f"{src}/{f}" for f in os.listdir(src) if f.endswith(".parquet")
        )
        inc = IncrementalLSHDedup(spark, f"{work}/idx", num_hashes=8, bands=4)
        for i, f in enumerate(files):
            batch = spark.read.parquet(f)
            out = t(f"process_batch[{i}]", lambda b=batch: inc.process_batch(b))
            t(f"  pairs.count[{i}]", lambda o=out: o.count())
            out.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def profile_cms(spark):
    from pyspark.sql import functions as F

    from etielle_spark.streaming.incremental_cms import IncrementalCMS

    work = tempfile.mkdtemp(prefix="prof_cms_")
    try:
        toks = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(
                "lang",
                F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"),
            )
            .filter(F.col("tok") != "")
        )
        src = f"{work}/src"
        toks.repartition(4).write.parquet(src)
        files = sorted(
            f"{src}/{f}" for f in os.listdir(src) if f.endswith(".parquet")
        )
        inc = IncrementalCMS(
            spark,
            f"{work}/state",
            item_col="tok",
            group_cols=["lang"],
            candidate_k=128,
            run_id="prof",
        )
        for i, f in enumerate(files):
            batch = spark.read.parquet(f)
            t(
                f"process_batch[{i}]",
                lambda b=batch, i=i: inc.process_batch(b, batch_id=i),
            )
        t("heavy_hitters", lambda: inc.heavy_hitters(k=10).count())
    finally:
        shutil.rmtree(work, ignore_errors=True)


def profile_stream_ref(spark):
    """The foreachBatch reference workload, one batch driven manually:
    separates pipeline COMPILE (builder.run() plan construction) from
    EXECUTION (sink writes)."""
    from pyspark.sql import functions as F

    from etielle_spark import Field, etl, get, get_from_parent
    from etielle_spark.sources import ParquetSink

    n = 1000
    work = tempfile.mkdtemp(prefix="prof_ref_")
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
        users.write.parquet(src)
        batch_df = spark.read.parquet(src)

        def compile_only():
            return (
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
            )

        for rep in range(3):
            b = t(f"builder construct[{rep}]", compile_only)
            res = t(f"run() compile[{rep}]", b.run)
            sink = ParquetSink(f"{work}/out{rep}", mode="append")
            t(
                f"sink writes[{rep}]",
                lambda r=res, s=sink: [
                    s.write(name, r[name]) for name in ("users", "posts")
                ],
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def profile_q215(spark):
    from pyspark.sql import functions as F

    from etielle_spark.operators.text import densify_counts, feature_hash, logreg_train

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    feats = feature_hash(docs, "doc_id", "text", n_buckets=64)
    dense = densify_counts(feats, "id", "bucket", "n", n_buckets=64)
    labeled = dense.join(
        docs.select(
            F.col("doc_id").alias("id"),
            (F.col("lang") == "en").cast("double").alias("y"),
        ),
        "id",
    )
    for rep in range(3):
        t(f"logreg_train[{rep}]", lambda: logreg_train(labeled, "id", "x", "y", lr=0.1, n_steps=2))


PROFILES = {
    "ivf": profile_ivf,
    "dedup": profile_dedup,
    "cms": profile_cms,
    "stream_ref": profile_stream_ref,
    "q215": profile_q215,
}


def main():
    names = sys.argv[1:] or list(PROFILES)
    from etielle_spark.session import get_spark

    spark = get_spark("profile-streaming", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: one scan+agg+write pass
    spark.read.parquet(f"{sf_dir}/documents.parquet").groupBy("lang").count().write.format(
        "noop"
    ).mode("overwrite").save()
    for name in names:
        print(f"== {name} ==")
        PROFILES[name](spark)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
