"""Scale stress: training-data operators on a 600k-document corpus.

Synthesizes one pseudo-document per sf0.1 lineitem row (~600k docs,
~100 chars each) and runs the dedup/text pipeline end-to-end.  This is the
shape check for 100 TB: all per-doc work is one scan pass, shuffles ride
on short digest keys, and no step is quadratic in corpus size.

    python tools/stress_scale.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

    from pyspark.sql import functions as F

    from etielle_spark.operators.dedup import (
        exact_dedup_by_content,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from etielle_spark.operators.text import lang_id, quality_score, token_stats
    from etielle_spark.session import get_spark

    spark = get_spark("stress-scale", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    docs = li.select(
        (F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("item"),
            F.col("l_returnflag"),
            F.col("l_linestatus"),
            F.col("l_quantity").cast("string"),
            F.col("l_extendedprice").cast("string"),
            F.col("l_discount").cast("string"),
            F.col("l_tax").cast("string"),
            F.date_format("l_shipdate", "yyyy MM dd"),
            F.col("l_partkey").cast("string"),
            F.col("l_suppkey").cast("string"),
        ).alias("text"),
    ).repartition(8).cache()
    # spread the cached corpus across the executor threads — the 2-3
    # file-split scan otherwise starves 5 of 8 cores in every step
    n = docs.count()

    timings: dict[str, float] = {}

    def step(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 2)
        return out

    n_unique = step("exact_dedup", lambda: exact_dedup_by_content(docs, "doc_id", "text").count())
    def force(df):
        # noop sink materializes EVERY column — a bare count() lets
        # Catalyst prune map-only computations to a scan (the round-3
        # bench fix, now applied to the stress receipts too)
        df.write.format("noop").mode("overwrite").save()
        return df

    sigs = step(
        "minhash_16",
        lambda: force(
            minhash_signatures(docs, "doc_id", "text", num_hashes=16)
        ),
    )
    n_sigs = sigs.count()
    n_pairs = step(
        "lsh_pairs",
        lambda: lsh_candidate_pairs(docs, "doc_id", "text", num_hashes=16, bands=4).count(),
    )
    n_pairs_capped = step(
        "lsh_pairs_capped",
        lambda: lsh_candidate_pairs(
            docs, "doc_id", "text", num_hashes=16, bands=4, max_bucket_size=64
        ).count(),
    )
    step("token_stats", lambda: force(token_stats(docs, "doc_id", "text")))
    step("quality", lambda: force(quality_score(docs, "doc_id", "text")))
    step("lang_id", lambda: force(lang_id(docs, "doc_id", "text")))

    # round-2 operators at the same corpus scale
    from etielle_spark.operators.clusters import mixture_resample
    from etielle_spark.operators.dedup import gram_duplication_stats
    from etielle_spark.operators.similarity import semdedup
    from etielle_spark.operators.web import cap_per_domain, charset_profile

    step("charset_profile", lambda: force(charset_profile(docs, "doc_id", "text")))
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://www.s"),
            (F.col("doc_id") % 1000).cast("string"),
            F.lit("-corp.org/d/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    n_capped = step(
        "domain_cap_50", lambda: cap_per_domain(urls, "doc_id", "url", cap=50).count()
    )
    n_gram_dropped = step(
        "gram_duplication_8",
        lambda: gram_duplication_stats(docs, "doc_id", "text", n=8)
        .filter(F.col("drop")).count(),
    )
    # adversarial skew: one boilerplate 8-gram stamped on 80% of the 600k
    # docs (the cookie-banner shape).  The groupBy+join-back plan keeps
    # this within ~2x of the uniform wall; the round-6 window-partition
    # plan pinned all ~480k postings of that digest into ONE task.
    boiler_docs = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 != 0,
            F.concat(
                F.col("text"),
                F.lit(" click here to accept our cookie policy terms"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    n_boiler_dropped = step(
        "gram_duplication_8_boiler80",
        lambda: gram_duplication_stats(boiler_docs, "doc_id", "text", n=8)
        .filter(F.col("drop")).count(),
    )
    from etielle_spark.operators.sketches import cms_heavy_hitters

    cms_toks = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    n_cms = step(
        "cms_heavy_hitters_600k",
        lambda: cms_heavy_hitters(cms_toks, "tok", depth=4, width=1024, k=20).count(),
    )
    src = docs.select(
        "doc_id",
        F.concat(F.lit("src"), (F.col("doc_id") % 7).cast("string")).alias("source"),
    )
    n_resampled = step(
        "mixture_resample",
        lambda: mixture_resample(
            src, "doc_id", "source", {"src0": 2.5, "src1": 0.25, "src2": 0.0}
        ).count(),
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    big_emb = (
        emb.select("vec_id", "embedding")
        .withColumn("copy", F.explode(F.sequence(F.lit(0), F.lit(9))))
        .select(
            (F.col("vec_id") * 10 + F.col("copy")).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + F.col("copy").cast("float") * 0.001
            ).alias("embedding"),
        )
    )
    n_vec = big_emb.count()
    n_semdrop = step(
        "semdedup_nlist64",
        lambda: semdedup(big_emb, "vec_id", "embedding", threshold=0.999, nlist=64)
        .filter(F.col("dropped")).count(),
    )

    # the map-only curation passes: classifier scoring, C4 cleaning,
    # shard assignment, HLL distinct — each must stay one scan at 600k
    from etielle_spark.operators.clusters import shard_assign
    from etielle_spark.operators.sketches import hll_distinct
    from etielle_spark.operators.text import classifier_score
    from etielle_spark.operators.web import c4_page_filter

    step(
        "classifier_score",
        lambda: force(
            classifier_score(
                docs, "doc_id", "text",
                {"item": 0.3, "n": -0.1, "r": 0.2, "a": -0.2},
            )
        ),
    )
    n_scored = n  # map-only: one score row per document
    n_c4 = step(
        "c4_page_filter",
        lambda: c4_page_filter(
            docs, "doc_id", "text",
            min_words_per_line=3, require_terminal_punct=False,
        ).filter(F.col("kept")).count(),
    )
    n_sharded = step(
        "shard_assign_256",
        lambda: shard_assign(docs, "doc_id", 256).groupBy("shard").count().count(),
    )
    n_hll = step(
        "hll_distinct_text",
        lambda: hll_distinct(docs, [], "text").count(),
    )

    # round-5 curation passes: corpus-wide line dedup (CCNet boilerplate
    # shape — digest agg + anti-join + reassembly) and DSIR importance
    # scoring (two bounded bucket counts + one broadcast-join scan)
    from etielle_spark.operators.dedup import line_dedup
    from etielle_spark.operators.text import dsir_logratio

    n_linededup = step(
        "line_dedup",
        lambda: line_dedup(
            docs.select(
                "doc_id",
                F.concat(
                    F.col("text"), F.lit("\nCOMMON FOOTER\nuniq "),
                    F.col("doc_id").cast("string"),
                ).alias("text"),
            ),
            "doc_id",
            "text",
        ).filter(F.col("n_kept") < F.col("n_lines")).count(),
    )
    n_dsir = step(
        "dsir_logratio",
        lambda: dsir_logratio(
            docs, "doc_id", "text",
            docs.filter(F.col("doc_id") % 100 == 0),
            n=2, n_buckets=4096,
        ).count(),
    )

    # round-5 additions: bloom-prefiltered exact anti join in its design
    # shape (filter built ONCE, amortized over ingest batches — the
    # IncrementalExactDedup pattern; one-shot build+probe is also timed
    # for honesty: at broadcastable reference size the plain anti join
    # wins, the bloom's regime is neither-side-broadcastable) and the
    # WebDataset tar shard writer
    from etielle_spark.operators.sketches import bloom_anti_join, bloom_build
    from etielle_spark.operators.webdataset import wds_write

    probe = docs.select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("k")
    )
    ref_keys = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(F.md5(F.col("doc_id").cast("string")).alias("k"))
    )
    words = bloom_build(ref_keys, "k", num_bits=1 << 23, num_hashes=5).cache()
    step("bloom_build", lambda: words.count())
    n_bloom_new = step(
        "bloom_anti_join_prebuilt",
        lambda: bloom_anti_join(
            probe, ref_keys, "k", num_bits=1 << 23, num_hashes=5, words=words
        ).count(),
    )
    n_plain_new = step(
        "plain_anti_join",
        lambda: probe.join(ref_keys.distinct(), ["k"], "left_anti").count(),
    )
    words.unpersist()

    import tempfile

    wds_dir = tempfile.mkdtemp(prefix="stress_wds_") + "/shards"
    n_wds = step(
        "wds_write_64_shards",
        lambda: int(
            wds_write(docs, wds_dir, "doc_id", {"txt": "text"}, num_shards=64)
            .agg(F.sum("n_samples"))
            .first()[0]
        ),
    )

    print(
        json.dumps(
            {
                "docs": n,
                "unique": n_unique,
                "signatures": n_sigs,
                "lsh_candidate_pairs": n_pairs,
                "lsh_candidate_pairs_capped": n_pairs_capped,
                "domain_capped_rows": n_capped,
                "gram_dup_dropped": n_gram_dropped,
                "gram_dup_boiler80_dropped": n_boiler_dropped,
                "cms_heavy_hitters": n_cms,
                "mixture_resampled_rows": n_resampled,
                "semdedup_vectors": n_vec,
                "semdedup_dropped": n_semdrop,
                "classifier_scored": n_scored,
                "c4_pages_kept": n_c4,
                "shards": n_sharded,
                "hll_groups": n_hll,
                "line_dedup_docs_trimmed": n_linededup,
                "dsir_scored": n_dsir,
                "bloom_anti_join_new": n_bloom_new,
                "plain_anti_join_new": n_plain_new,
                "wds_samples_written": n_wds,
                "timings_sec": timings,
                "total_sec": round(sum(timings.values()), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
