"""The full training-data flow composed end-to-end:

raw JSON documents -> fluent extraction (etl) -> quality filter ->
exact + near dedup -> fingerprint + language annotation -> topological
parquet write.  This is the shape a 100 TB curation pipeline takes; every
stage is the same operator the oracle-checked queries declare.
"""

import json

from pyspark.sql import functions as F

from etielle_spark import Field, etl, get
from etielle_spark.operators.dedup import exact_dedup_by_content, lsh_candidate_pairs
from etielle_spark.operators.text import doc_fingerprint, lang_id, quality_score
from etielle_spark.sources import ParquetSink


def test_full_curation_pipeline(spark, tmp_path):
    # 1) raw corpus: JSON lines with nested metadata (some duplicated)
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    raw = base.select(
        F.to_json(
            F.struct(
                F.col("doc_id"),
                F.col("text"),
                F.struct(F.col("source"), F.col("lang").alias("claimed_lang")).alias("meta"),
            )
        ).alias("payload")
    )
    dupes = raw.limit(10)  # exact duplicates to be removed
    corpus = raw.union(dupes)

    # 2) parse + extract via the fluent engine (one compiled plan)
    docs_df = corpus.select(
        F.from_json(
            "payload",
            "doc_id bigint, text string, meta struct<source:string, claimed_lang:string>",
        ).alias("doc")
    )
    result = (
        etl(docs_df, spark=spark)
        .goto("doc")
        .each(mode="single")
        .map_to(
            "docs",
            fields=[
                Field("doc_id", get("doc_id")),
                Field("text", get("text")),
                Field("source", get("meta.source")),
                Field("claimed_lang", get("meta.claimed_lang")),
            ],
        )
        .run()
    )
    docs = result["docs"]
    assert docs.count() == 90

    # 3) quality filter
    q = quality_score(docs, "doc_id", "text")
    keep_ids = q.filter(F.col("n_tokens") >= 10).select("doc_id").dropDuplicates()
    filtered = docs.join(keep_ids, "doc_id", "left_semi")

    # 4) exact dedup (the 10 injected clones collapse)
    uniq_digests = exact_dedup_by_content(filtered, "doc_id", "text")
    survivors = filtered.join(
        uniq_digests.select("doc_id"), "doc_id", "left_semi"
    ).dropDuplicates(["doc_id"])
    assert survivors.count() <= 80

    # 5) near-dup candidates among survivors (none expected in this corpus)
    pairs = lsh_candidate_pairs(survivors, "doc_id", "text", num_hashes=8, bands=4)
    near_dupe_ids = pairs.select(F.col("id_b").alias("doc_id")).dropDuplicates()
    final = survivors.join(near_dupe_ids, "doc_id", "left_anti")

    # 6) annotate + write
    annotated = (
        final.join(doc_fingerprint(final, "doc_id", "text"), "doc_id")
        .join(lang_id(final, "doc_id", "text"), "doc_id")
    )
    sink = ParquetSink(str(tmp_path))
    sink.write("curated_docs", annotated)

    back = spark.read.parquet(str(tmp_path / "curated_docs"))
    assert back.count() == final.count()
    assert {"doc_id", "text", "fingerprint", "pred_lang", "source"} <= set(back.columns)
    # every surviving fingerprint is unique (dedup actually deduped)
    assert back.select("fingerprint").dropDuplicates().count() == back.count()
