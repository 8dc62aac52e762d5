"""End-to-end corpus curation pipeline: the composed
dedup -> quality-gate -> split -> account flow that a training-data run
executes as ONE Spark DAG.

Each stage is an operator that exists standalone elsewhere in this
package; the value of the composition is that Catalyst plans the whole
flow together — the digest window's shuffle is the only corpus-wide
exchange, the quality gate and split assignment ride the same pass, and
the final accounting aggregates (split, group) cells whose cardinality
is independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .clusters import hash_split
from .dedup import tokens_col


def curate_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    *,
    min_tokens: int = 10,
    max_tokens: int = 1_000_000,
    thresholds: dict[str, int] | None = None,
) -> DataFrame:
    """Curate a document corpus in one DAG:

    1. exact content dedup — smallest id survives per md5(text) digest
       (ONE window shuffle on the 32-byte digest, text never shuffled);
    2. quality gate — token count in [min_tokens, max_tokens], computed
       in the same scan;
    3. deterministic train/val/test assignment (md5-bucket hash_split —
       pure projection, documents and their derived rows stay in the
       same split across reruns and engines);
    4. accounting — (split, group) cells with document and token totals.

    Returns ``(split, group, n_docs, total_tokens)`` — the dataset-card
    summary; the survivor frame itself is the pipeline's intermediate
    and can be taken by composing the stages directly.
    """
    digest = F.md5(F.col(text_col))
    w = Window.partitionBy("__digest").orderBy(F.col(id_col))
    survivors = (
        df.select(
            F.col(id_col),
            F.col(group_col),
            F.size(tokens_col(F.col(text_col))).cast("bigint").alias("__ntok"),
            digest.alias("__digest"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col("__ntok").between(min_tokens, max_tokens))
        .drop("__rn", "__digest")
    )
    assigned = hash_split(
        survivors, id_col, thresholds=thresholds, keep_all=True
    )
    return assigned.groupBy(
        F.col("split"), F.col(group_col).alias("group")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__ntok").cast("bigint").alias("total_tokens"),
    )


def nucleus_select(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    *,
    p: float = 0.9,
) -> DataFrame:
    """Top-p ("nucleus") selection per group: rank rows by score
    descending and keep the smallest prefix whose cumulative score
    reaches fraction ``p`` of the group total (the row that crosses the
    threshold is included).

    This is budgeted curation — "keep the highest-quality documents
    covering 90% of each source's total quality mass" — a
    diminishing-returns cut that, unlike a fixed top-k, adapts to how
    concentrated each group's quality distribution is (a group where a
    few documents dominate keeps few; a flat group keeps most).

    One shuffle partitioned by the group: a running-sum window ordered by
    (score desc, id) and a group-total window over the same partition
    ride the same exchange (the whole-partition frame spills through
    Spark's external sorter on skewed groups rather than OOMing).
    Scores are assumed non-negative — quality scores, token counts,
    sampling weights.  Deterministic: ties break on id in any engine.

    Returns the selected rows with ``rank`` and ``cum_frac`` (the
    cumulative share including the row itself).
    """
    if not 0 < p <= 1:
        raise ValueError(f"p must be in (0, 1], got {p}")
    score = F.col(score_col).cast("double")
    order = [score.desc(), F.col(id_col).asc()]
    wrun = (
        Window.partitionBy(group_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(group_col)
    cum = F.sum(score).over(wrun)
    tot = F.sum(score).over(wall)
    out = (
        df.withColumn("__cum", cum)
        .withColumn("__tot", tot)
        .withColumn("rank", F.row_number().over(Window.partitionBy(group_col).orderBy(*order)))
        # keep while the mass BEFORE this row is still short of p*total
        .filter((F.col("__cum") - score) < F.lit(p) * F.col("__tot"))
        .withColumn("cum_frac", F.col("__cum") / F.col("__tot"))
        .drop("__cum", "__tot")
    )
    return out
