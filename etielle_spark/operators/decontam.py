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
