"""Data-layout planning: space-filling-curve (Z-order) sort keys.

At 100 TB the cheapest query is the one that never reads the data:
sorting/partitioning output files by a Z-order (Morton) key over the
common filter columns makes parquet row-group min/max statistics tight
in EVERY interleaved dimension at once, so multi-column predicates prune
row groups that a single-column sort could only prune for its leading
column.  This is the same layout trick Delta/Iceberg expose as
``OPTIMIZE ... ZORDER BY``; here it is a plain column expression usable
with ``df.repartitionByRange(zorder_key(...)).sortWithinPartitions(...)``
before a write.

The key is pure integer bit-math (shifts/masks) — codegen'd, no UDF,
and reproducible in any engine, which is how the oracle verifies it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(cols: list[Column | str], *, bits: int = 8) -> Column:
    """Morton-interleave the low ``bits`` of each column into one sort
    key.  Column i contributes bit b to output position
    ``b * len(cols) + i`` — the standard Z-curve generalized to any
    number of dimensions.

    Inputs are masked to ``bits`` (callers bucket/normalize first:
    ``F.col("x") % 1024`` or a width_bucket-style quantization);
    ``len(cols) * bits`` must fit in 63 bits.
    """
    ncols = len(cols)
    if ncols == 0:
        raise ValueError("zorder_key needs at least one column")
    if ncols * bits > 63:
        raise ValueError("zorder_key: len(cols) * bits must be <= 63")
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        x = (F.col(c) if isinstance(c, str) else c).cast("long")
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftright(x, b).bitwiseAND(F.lit(1)), b * ncols + i
            )
    return z


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 8,
    n_files: int | None = None,
) -> DataFrame:
    """Return ``df`` re-laid-out for write: range-partitioned and sorted
    by the Z-order key of ``cols`` (masked to ``bits``).  Writing the
    result yields files whose per-column min/max stats are tight in all
    ``cols`` simultaneously.  ``n_files`` sets the range-partition count
    (target file count); default leaves ``spark.sql.shuffle.partitions``.
    """
    key = zorder_key([F.col(c) for c in cols], bits=bits).alias("__zkey")
    with_key = df.withColumn("__zkey", key)
    parted = (
        with_key.repartitionByRange(n_files, "__zkey")
        if n_files
        else with_key.repartitionByRange("__zkey")
    )
    return parted.sortWithinPartitions("__zkey").drop("__zkey")


def bucket_layout(
    df: DataFrame,
    table: str,
    keys: list[str],
    *,
    num_buckets: int,
    sort_by: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a BUCKETED table: files are hash-clustered on
    ``keys`` into ``num_buckets`` buckets (and optionally sorted within
    each bucket), registered in the session catalog under ``table``.

    This is the shuffle-elimination layout for repeated big joins and
    aggregations: two tables bucketed on the same keys with the same
    bucket count join with ZERO Exchange on either side — at 100 TB the
    join shuffle IS the cost, and bucketing prepays it once at write
    time for every subsequent query.  A ``groupBy`` on the bucket keys
    likewise reuses the stored clustering instead of shuffling.
    (Spark's bucketed-scan planning needs the catalog entry, which is
    why this writes a table, not bare files; ``path`` keeps the data at
    an external location.)  ``sort_by`` additionally pre-sorts each
    bucket file so sort-merge joins skip their sort too.

    Bucket pruning: an equality filter on the first bucket key scans
    ``1/num_buckets`` of the files.  Pick ``num_buckets`` so one bucket
    of the LARGER table fits an executor's shuffle-free merge (~the
    same arithmetic as ``spark.sql.files.maxPartitionBytes``).
    """
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    if not keys:
        raise ValueError("bucket_layout needs at least one bucket key")
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *keys)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
