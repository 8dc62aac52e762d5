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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from etielle_spark.operators.dedup import (
        exact_dedup_by_content,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from etielle_spark.operators.text import lang_id, quality_score, token_stats
    from etielle_spark.session import get_spark

    spark = get_spark("stress-scale", cpus=8)
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
    ).cache()
    n = docs.count()

    timings: dict[str, float] = {}

    def step(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 2)
        return out

    n_unique = step("exact_dedup", lambda: exact_dedup_by_content(docs, "doc_id", "text").count())
    n_sigs = step(
        "minhash_16", lambda: minhash_signatures(docs, "doc_id", "text", num_hashes=16).count()
    )
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
    step("token_stats", lambda: token_stats(docs, "doc_id", "text").count())
    step("quality", lambda: quality_score(docs, "doc_id", "text").count())
    step("lang_id", lambda: lang_id(docs, "doc_id", "text").count())

    print(
        json.dumps(
            {
                "docs": n,
                "unique": n_unique,
                "signatures": n_sigs,
                "lsh_candidate_pairs": n_pairs,
                "lsh_candidate_pairs_capped": n_pairs_capped,
                "timings_sec": timings,
                "total_sec": round(sum(timings.values()), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
