"""Two-phase FK insert against DB-generated parent IDs.

Reference behavior (Supabase path, etielle/fluent.py:902-1059): insert
parents, capture returned generated IDs (row-count mismatch is an error),
populate child FK columns from the returned rows, insert children.

Spark has no RETURNING, so the pattern is: stage parents with their
natural keys -> write -> read the written table back -> join children to
written parents on the natural key to pick up generated IDs (SURVEY §7
hard part #4).  With a real database the generated column comes from the
DB (IDENTITY/SERIAL); the parquet variant below synthesizes it at write
time so the full flow is exercisable anywhere.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, functions as F


def write_parents_with_generated_ids(
    spark: SparkSession,
    parent_df: DataFrame,
    path: str,
    *,
    natural_key: list[str],
    gen_col: str = "gen_id",
) -> DataFrame:
    """Phase 1: write parents, return the written rows WITH generated ids.

    The generated id is synthesized (row_number over the natural key —
    deterministic) where a real DB would assign IDENTITY values; the
    read-back is from storage, exactly like a JDBC re-select.  Raises if
    the read-back row count mismatches the staged count (reference
    fluent.py:985-1000 row-count check).
    """
    from pyspark.sql import Window

    w = Window.orderBy(*[F.col(k) for k in natural_key])
    staged = parent_df.withColumn(gen_col, F.row_number().over(w).cast("bigint"))
    staged.write.mode("overwrite").parquet(path)
    written = spark.read.parquet(path)
    n_staged, n_written = parent_df.count(), written.count()
    if n_staged != n_written:
        raise RuntimeError(
            f"two-phase write: staged {n_staged} parent rows but read back "
            f"{n_written} — generated-ID capture is unsafe"
        )
    return written


def populate_child_fk(
    child_df: DataFrame,
    written_parents: DataFrame,
    *,
    by: dict[str, str],
    fk_col: str,
    gen_col: str = "gen_id",
    required: bool = False,
) -> DataFrame:
    """Phase 2: children pick up the parent's generated id via a
    natural-key equi join (broadcast — parents of one batch are small
    relative to fact children)."""
    (cf, pf), *rest = by.items()
    if rest:
        raise ValueError("populate_child_fk: single natural-key pair only")
    parent_side = written_parents.select(
        F.col(pf).alias("__tp_key"), F.col(gen_col).alias(fk_col)
    ).dropDuplicates(["__tp_key"])
    out = child_df.join(
        F.broadcast(parent_side), child_df[cf] == parent_side["__tp_key"], "left"
    ).drop("__tp_key")
    if required:
        missing = out.filter(F.col(cf).isNotNull() & F.col(fk_col).isNull()).limit(3)
        rows = missing.collect()
        if rows:
            raise RuntimeError(
                f"two-phase FK: children reference unwritten parents: "
                f"{[r[cf] for r in rows]}"
            )
    return out
