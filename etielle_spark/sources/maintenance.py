"""Table-layout maintenance: small-file compaction.

A 100 TB table ingested by streaming micro-batches or per-partition
appends accumulates thousands of KB-sized files; every subsequent scan
then pays one task + one open/footer-read per file, and the driver pays
the listing.  Compaction rewrites the data as files near a target size
with NO logical change — the table reads back identical.

The row-group math stays on the executors: we size the coalesce from
the files' total bytes (driver-side listing metadata only — no data
moves through the driver).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def plan_compaction(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    format: str = "parquet",
) -> dict:
    """Inspect a table directory and return the compaction plan:
    ``{"n_files", "total_bytes", "target_files", "needed"}``.

    ``needed`` is False when the table is already at or below the target
    file count (compacting would just burn a rewrite).  Uses the
    Hadoop FileSystem listing — metadata only.
    """
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    n_files, total = 0, 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        n_files += 1
        total += st.getLen()
    target_files = max(1, math.ceil(total / target_file_bytes))
    return {
        "n_files": n_files,
        "total_bytes": total,
        "target_files": target_files,
        "needed": n_files > target_files,
    }


def compact_small_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    format: str = "parquet",
    sort_within_by: list[str] | None = None,
) -> dict:
    """Rewrite ``path`` into ``out_path`` as ~``target_file_bytes`` files.

    - file count comes from actual on-disk bytes (compression included),
      not row counts — the one signal that predicts output file size;
    - ``coalesce`` (narrow, no shuffle) merges input splits into the
      target count; with ``sort_within_by`` the rewrite instead
      ``repartition``\\ s on those columns and sorts within partitions,
      buying scan-level min/max pruning on the sort keys at the cost of
      the one shuffle;
    - writes to a NEW directory (atomic swap is the caller's rename) —
      never compact in place, a failed in-place rewrite loses the table.

    Returns the executed plan dict from :func:`plan_compaction`.
    """
    plan = plan_compaction(
        spark, path, target_file_bytes=target_file_bytes, format=format
    )
    df: DataFrame = spark.read.format(format).load(path)
    n = plan["target_files"]
    if sort_within_by:
        out = df.repartition(n, *sort_within_by).sortWithinPartitions(
            *sort_within_by
        )
    else:
        out = df.coalesce(n)
    out.write.format(format).mode("overwrite").save(out_path)
    return plan
