"""Corpus search operators: inverted-index build and BM25 retrieval.

Both are expressed as document-key / term-key aggregations so the only
shuffles are on well-spread keys (term, doc id); the corpus-level
constants a BM25 scorer needs (N, avgdl) are a one-row aggregate that
Spark broadcasts into the scoring join.  A 100 TB corpus indexes as one
explode + one groupBy per stage — no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import tokens_col


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_df: int = 1,
    posting_sample: int = 20,
) -> DataFrame:
    """Build term postings: for every token, the document frequency,
    total term frequency, and a deterministic sample of the first
    ``posting_sample`` doc ids (ascending).

    One explode + one term-keyed groupBy.  The posting list is capped at
    ``posting_sample`` ids so a stop-word's row stays bounded — at scale
    the full posting set lives as the (term, doc) pairs themselves, and
    this summary is the dictionary.  Returns
    ``(term, df, tf_total, postings)``.
    """
    pairs = (
        df.select(F.col(id_col).alias("__doc"), F.explode(tokens_col(F.col(text_col))).alias("term"))
        .groupBy("term", "__doc")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__tf"))
    )
    return (
        pairs.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.sum("__tf").cast("bigint").alias("tf_total"),
            F.array_join(
                F.slice(F.sort_array(F.collect_list("__doc")), 1, posting_sample),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
    round_to: int = 6,
) -> DataFrame:
    """Score every document against a bag-of-terms query with BM25 and
    return the top ``k``.

    ``score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1-b+b*dl/avgdl))``
    with the standard ``idf(t) = ln(1 + (N-df+0.5)/(df+0.5))``.

    Plan shape: the document length rides along the explode (so there is
    never a join back to a corpus-sized table), the explode is
    restricted to the query terms before any shuffle moves tokens, a
    (doc, term) tf aggregation follows, and only the TINY frames — the
    per-query-term df counts and the one-row (N, avgdl) corpus
    aggregate — are broadcast into the scoring join.  Ranking is on the
    ROUNDED score with the doc id as tie-break, so the result is
    deterministic and engine-reproducible.

    Returns ``(id, score)`` ordered by (score desc, id asc), ``k`` rows.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = tokens_col(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("__doc"),
        toks.alias("__toks"),
    ).select(
        F.col("__doc"),
        F.size("__toks").cast("double").alias("__dl"),
        F.col("__toks"),
    )

    corpus = base.agg(
        F.count(F.lit(1)).cast("double").alias("__N"),
        F.avg("__dl").alias("__avgdl"),
    )

    pairs = (
        base.select(
            F.col("__doc"), F.col("__dl"), F.explode("__toks").alias("__term")
        )
        .filter(F.col("__term").isin([str(t) for t in query_terms]))
        .groupBy("__doc", "__term")
        .agg(
            F.count(F.lit(1)).cast("double").alias("__tf"),
            F.first("__dl").alias("__dl"),
        )
    )
    dfreq = pairs.groupBy("__term").agg(
        F.count(F.lit(1)).cast("double").alias("__df")
    )

    idf = F.log(
        F.lit(1.0)
        + (F.col("__N") - F.col("__df") + F.lit(0.5)) / (F.col("__df") + F.lit(0.5))
    )
    tf_part = (F.col("__tf") * (k1 + 1.0)) / (
        F.col("__tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
    )
    scored = (
        pairs.join(F.broadcast(dfreq), "__term")
        .crossJoin(F.broadcast(corpus))
        .groupBy("__doc")
        .agg(F.round(F.sum(idf * tf_part), round_to).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("__doc").asc())
        .limit(int(k))
        .select(F.col("__doc").alias(id_col), "score")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    query_col: str = "query_id",
    id_col: str = "id",
    rank_col: str = "rank",
    k0: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of N per-query rankings (Cormack et al.
    2009) — the hybrid-retrieval merge step (dense ANN + sparse BM25 +
    ...): fused score = Σ systems 1/(k0 + rank), missing items simply
    contribute nothing.

    Each input frame carries (query_col, id_col, rank_col) with rank
    starting at 1.  The union is one shuffle on (query, id); the final
    per-query top-k is a window over the (already small) fused list —
    candidate counts are bounded by Σ per-system k, never corpus size,
    so fusion cost is independent of the 100 TB corpus behind the
    rankings.  Ties order by id ascending for determinism.

    Returns (query_col, id_col, rrf_score, fused_rank).
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    from pyspark.sql import Window

    parts = [
        r.select(
            F.col(query_col),
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col))).alias("__c"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(query_col, id_col).agg(
        F.round(F.sum("__c"), 6).alias("rrf_score")
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col)
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= top_k)
    )
