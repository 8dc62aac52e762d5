"""Benchmark decontamination: flag training documents sharing word
n-grams with an evaluation set.

The standard pre-training hygiene step (GPT-3 appendix C / Gopher /
Llama): any training document containing an n-gram that also occurs in a
benchmark's text is flagged (and usually dropped or split).

Distributed shape for 100 TB:

- Both sides are shingled with the same distinct-n-gram construction as
  the dedup family (``dedup.shingle_df`` — linear per document, no
  lambda-inlined re-tokenization), then reduced to md5 digests so the
  join key is 32 bytes regardless of gram length.
- The eval side (benchmarks: thousands of documents, not billions) is
  deduplicated to distinct gram digests and broadcast by default — the
  corpus-side scan streams once with a map-side hash probe and never
  shuffles the corpus.  With ``broadcast_eval=False`` the same plan runs
  as a shuffle equi-join for oversized eval sets.
- Output is one row per contaminated corpus document (inner join +
  groupBy on doc id), so downstream drop/split joins are anti-joins on
  the id only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingle_df


def ngram_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    eval_text_col: str | None = None,
    n: int = 13,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Corpus documents sharing at least one word ``n``-gram with
    ``eval_df``.

    Returns ``(id_col, n_hits, n_grams, contam_frac)`` — the number of
    distinct corpus-document grams that occur anywhere in the eval set,
    the document's distinct gram count, and their ratio rounded to 6
    places.  Documents with no collision are absent (inner semantics);
    callers drop flagged docs with a left-anti join on ``id_col``.

    Documents shorter than ``n`` tokens contribute their full text as a
    single gram (same fallback as the dedup shinglers), so short
    benchmark prompts still match verbatim copies.
    """
    eval_text = eval_text_col or text_col

    corpus_grams = shingle_df(corpus, id_col, text_col, n).select(
        F.col(id_col), F.md5("shingle").alias("__d")
    )
    eval_grams = (
        shingle_df(eval_df.select(F.lit(0).alias("__eid"), F.col(eval_text)),
                   "__eid", eval_text, n)
        .select(F.md5("shingle").alias("__d"))
        .distinct()
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)

    per_doc = corpus_grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        corpus_grams.join(eval_grams, "__d")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return hits.join(per_doc, id_col).select(
        F.col(id_col),
        F.col("n_hits"),
        F.col("n_grams"),
        F.round(F.col("n_hits").cast("double") / F.col("n_grams"), 6).alias(
            "contam_frac"
        ),
    )


def embedding_contamination(
    corpus: DataFrame,
    eval_set: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float = 0.85,
    planes: int = 8,
    dim: int | None = None,
    probes: int = 2,
    round_cosine: int | None = None,
) -> DataFrame:
    """Embedding-space decontamination: flag corpus rows whose embedding
    is within cosine ``threshold`` of ANY eval-set embedding.

    N-gram contamination (:func:`ngram_contamination`) misses paraphrased
    benchmark leakage; the embedding pass catches semantic near-matches
    the way SemDedup catches semantic near-duplicates.  Candidate pairs
    come from the same sign-random-projection buckets as the ANN path
    (``similarity.lsh_bucket_topk``): the eval side (small by nature) is
    bucketed, multi-probed to Hamming-1 neighbors, and broadcast; the
    corpus streams once through a map-side bucket probe, exact cosine is
    computed only inside matching buckets, and the per-document verdict
    aggregates to one row per contaminated id.  No corpus shuffle, no
    all-pairs anything.

    Returns ``(id_col, max_cosine, matched_eval_id, n_eval_hits)`` for
    flagged corpus rows only; anti-join it back on the id to drop them.
    """
    from .similarity import _bucket_bits, cosine

    if dim is None:
        first = corpus.select(vec_col).head(1)
        if not first:
            raise ValueError(
                "embedding_contamination: empty corpus and no explicit dim="
            )
        dim = len(first[0][0])

    c = corpus.select(
        F.col(id_col).alias("__cid"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    ).withColumn("bucket", _bucket_bits("__cv", planes, dim))
    e = eval_set.select(
        F.col(id_col).alias("__eid"),
        F.col(vec_col).cast("array<double>").alias("__ev"),
    ).withColumn("bucket", _bucket_bits("__ev", planes, dim))

    if probes > 1:
        def flip(b, i):
            flipped = F.when(
                F.substring(b, i + 1, 1) == "1", F.lit("0")
            ).otherwise(F.lit("1"))
            return F.concat(
                F.substring(b, 1, i), flipped, F.substring(b, i + 2, planes - i - 1)
            )

        probe_buckets = F.array(
            F.col("bucket"), *[flip(F.col("bucket"), i) for i in range(planes)]
        )
        e = e.withColumn("bucket", F.explode(probe_buckets))

    cos = cosine(F.col("__cv"), F.col("__ev"))
    if round_cosine is not None:
        cos = F.round(cos, round_cosine)
    # NOTE: no `__cid != __eid` filter — corpus and eval are independent
    # datasets whose id namespaces commonly collide (both zero-based);
    # a cross-set join cannot produce a true self-pair, so equality of
    # ids must not suppress a genuine contamination hit.
    hits = (
        c.join(F.broadcast(e), "bucket")
        .select("__cid", "__eid", cos.alias("__cos"))
        # multi-probe can reach the same (corpus, eval) pair through
        # several buckets — collapse before the verdict aggregation
        .dropDuplicates(["__cid", "__eid"])
        .filter(F.col("__cos") >= threshold)
    )
    return hits.groupBy("__cid").agg(
        F.max("__cos").alias("max_cosine"),
        F.max_by("__eid", F.struct(F.col("__cos"), -F.col("__eid"))).alias(
            "matched_eval_id"
        ),
        F.count("*").alias("n_eval_hits"),
    ).withColumnRenamed("__cid", id_col)
