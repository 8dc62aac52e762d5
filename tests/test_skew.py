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


def test_lsh_max_bucket_size_stoplist_semantics(spark):
    """The round-7 groupBy+left-semi stop-list keeps max_bucket_size's
    observable semantics: capped run == uncapped run minus pairs that
    exist ONLY via over-cap buckets."""
    from etielle_spark.operators.dedup import band_digests, lsh_candidate_pairs

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(60)
    )
    # 12 exact clones of one doc -> every band bucket they share has >= 13
    # members and must be stop-listed at cap 8
    seed = docs.limit(1)
    clones = seed.crossJoin(spark.range(12).withColumnRenamed("id", "c")).selectExpr(
        "doc_id + 500000 + c AS doc_id", "text"
    )
    corpus = docs.union(clones).cache()

    uncapped = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(
            corpus, "doc_id", "text", num_hashes=8, bands=4
        ).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(
            corpus, "doc_id", "text", num_hashes=8, bands=4, max_bucket_size=8
        ).collect()
    }
    # recompute the expected survivor set from first principles
    banded = band_digests(corpus, "doc_id", "text", num_hashes=8, bands=4)
    sizes = banded.groupBy("band", "band_digest").count()
    ok = sizes.filter(F.col("count") <= 8).select("band", "band_digest")
    kept = banded.join(ok, ["band", "band_digest"], "left_semi")
    a, b = kept.alias("l"), kept.alias("r")
    expected = {
        (r["id_a"], r["id_b"])
        for r in a.join(
            b,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_digest") == F.col("r.band_digest"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
        .collect()
    }
    assert capped == expected
    assert capped < uncapped  # the hot bucket's pairs really were dropped
    corpus.unpersist()


def test_plan_lint_digest_window_rule(spark):
    """The digest_window lint flags count-over-digest-window plans and
    exempts WindowGroupLimit-guarded survivors, bounded pmod keys, and
    the fixed gram_duplication_stats shape."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from plan_lint import _digest_windows

    from pyspark.sql import Window

    df = spark.range(100).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("g")
    )

    def plan(frame):
        return frame._jdf.queryExecution().executedPlan().toString()

    old_q100_shape = df.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    assert _digest_windows(plan(old_q100_shape)) == 1

    survivor = df.withColumn(
        "rk", F.row_number().over(Window.partitionBy("g").orderBy("id"))
    ).filter(F.col("rk") == 1)
    assert _digest_windows(plan(survivor)) == 0

    shard = spark.range(100).select(
        F.col("id"),
        F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(64)).alias("shard"),
    )
    bounded = shard.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("shard"))
    )
    assert _digest_windows(plan(bounded)) == 0

    from etielle_spark.operators.dedup import gram_duplication_stats

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i"), (2, "a b c d e f g h i")], ["id", "text"]
    )
    assert _digest_windows(plan(gram_duplication_stats(docs, "id", "text", n=8))) == 0
