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
