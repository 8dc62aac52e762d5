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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    *,
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff two table snapshots by primary key: classify every key as
    ``added`` (only in new), ``removed`` (only in old), ``changed``
    (both, any value column differs) or ``unchanged``.

    The data-versioning primitive (Delta/Iceberg snapshot compare,
    dataset-release QA): at 100 TB it is ONE full-outer sort-merge join
    on the primary key — values are compared with a null-safe eqNullSafe
    conjunction, no hashing pass over either side and no second shuffle.
    ``unchanged`` rows (typically ~all of them) are dropped before the
    result materializes unless ``include_unchanged`` is set.

    Returns key columns + ``change`` + ``<col>_old`` / ``<col>_new``
    per value column.
    """
    if not key_cols:
        raise ValueError("snapshot_diff: key_cols must be non-empty")
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in key_cols],
        *[F.col(c).alias(f"{c}_old") for c in value_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in key_cols],
        *[F.col(c).alias(f"{c}_new") for c in value_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in key_cols:
        c = o[f"__ko_{k}"].eqNullSafe(n[f"__kn_{k}"])
        cond = c if cond is None else cond & c
    j = o.join(n, cond, "full_outer")
    same_vals = F.lit(True)
    for c in value_cols:
        same_vals = same_vals & F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same_vals, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out = j.select(
        *[
            F.coalesce(F.col(f"__ko_{k}"), F.col(f"__kn_{k}")).alias(k)
            for k in key_cols
        ],
        change.alias("change"),
        *[F.col(f"{c}_old") for c in value_cols],
        *[F.col(f"{c}_new") for c in value_cols],
    )
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out
