"""Change-data-capture application: batch MERGE of an ordered change
stream onto a base table.

The batch analog of the reference's upsert flush strategies
(/root/reference/etielle/fluent.py flush semantics: update / skip /
key-complete): given a base snapshot and a (key, seq, op, payload)
change log, produce the next snapshot.  At 100 TB this is the nightly
compaction job: one change-keyed aggregation picks each key's final op
(no window over the whole table), then ONE full-outer join against the
base applies it — both shuffles are on the (well-spread) primary key,
and AQE handles skewed hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

OP_INSERT = "I"
OP_UPDATE = "U"
OP_DELETE = "D"


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Apply a change log to a base snapshot with last-writer-wins
    semantics per key.

    For every key, the change with the highest ``seq_col`` decides:
    ``D`` drops the row; ``I``/``U`` upserts the change's
    ``value_cols``.  Keys absent from the change log keep their base
    row.  Ties on ``seq_col`` are broken by preferring the delete (the
    conservative choice) and then the op string descending, so the
    result is deterministic.

    Plan: ``max_by`` folds each key's change history in one partial-agg
    shuffle (no row_number window), then a single full-outer join with
    the base resolves the three cases as column expressions.

    Returns the next snapshot with ``key_cols + value_cols``.
    """
    if not key_cols or not value_cols:
        raise ValueError("key_cols and value_cols must be non-empty")

    ordk = F.struct(
        F.col(seq_col).alias("s"),
        (F.col(op_col) == OP_DELETE).cast("int").alias("d"),
        F.col(op_col).alias("o"),
    )
    payload = F.struct(
        F.col(op_col).alias("__op"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    latest = (
        changes.groupBy(*key_cols)
        .agg(F.max_by(payload, ordk).alias("__w"))
        .select(
            *key_cols,
            F.col("__w.__op").alias("__op"),
            *[F.col(f"__w.{c}").alias(f"__c_{c}") for c in value_cols],
        )
    )
    joined = base.alias("b").join(latest.alias("c"), key_cols, "full_outer")
    kept = joined.filter(
        F.col("__op").isNull() | (F.col("__op") != OP_DELETE)
    )
    return kept.select(
        *key_cols,
        *[
            F.when(F.col("__op").isNotNull(), F.col(f"__c_{c}"))
            .otherwise(F.col(f"b.{c}"))
            .alias(c)
            for c in value_cols
        ],
    )
