"""Multi-format table readers + a scale-aware partitioned writer.

The reference ingests Python objects / JSON documents; a Spark engine at
100 TB ingests columnar and line-oriented files.  ``read_table`` wraps
the DataFrameReader with the settings that matter at scale:

- explicit ``schema`` wherever possible — schema inference is a full
  extra pass over CSV/JSON inputs;
- parquet/orc stay the default: predicate pushdown + column pruning
  come from the format, CSV/JSON scans always read whole rows;
- ``mergeSchema`` off by default (a footer-read per file otherwise).

``write_partitioned`` is the layout-control sink: hive partitioning by
low-cardinality keys for partition pruning, ``maxRecordsPerFile``
against giant files, optional ``sort_by`` so each file is internally
ordered (rowgroup min/max zone maps actually prune — the q109 z-order
key is a natural sort column).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_FORMATS = {"parquet", "orc", "csv", "json", "text"}


def read_table(
    spark: SparkSession,
    path: str,
    *,
    format: str = "parquet",
    schema: Optional[T.StructType | str] = None,
    header: bool = True,
    multiline: bool = False,
    **options: str,
) -> DataFrame:
    """Read ``path`` in the given format with scale-safe defaults.

    CSV/JSON without an explicit ``schema`` emit a warning-grade error:
    pass one, or sample-infer once and pin the result — inference is a
    full extra data pass and is nondeterministic under schema drift.
    """
    fmt = format.lower()
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {format!r}; one of {sorted(_FORMATS)}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(
            f"{fmt} read without an explicit schema would run a full "
            "inference pass over the data; pass schema= (use "
            "infer_schema_once() to sample and pin one)"
        )
    if fmt == "csv":
        reader = reader.option("header", str(header).lower())
    if fmt == "json" and multiline:
        reader = reader.option("multiLine", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def infer_schema_once(
    spark: SparkSession,
    path: str,
    *,
    format: str = "csv",
    sample_files: int = 1,
    header: bool = True,
    **options: str,
) -> T.StructType:
    """Infer a schema from a bounded sample (first ``sample_files`` files)
    and return it for pinning — the one-time cost a production pipeline
    pays once, not per run."""
    import glob as _glob
    import os

    files = [
        f
        for f in sorted(_glob.glob(os.path.join(path, "*")))
        if not os.path.basename(f).startswith(("_", "."))
    ] or [path]
    sample = files[:sample_files]
    reader = spark.read.format(format).option("inferSchema", "true")
    if format == "csv":
        reader = reader.option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(sample).schema


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    format: str = "parquet",
    partition_by: Optional[list[str]] = None,
    sort_by: Optional[list[str]] = None,
    max_records_per_file: Optional[int] = None,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """Layout-controlled write: hive-partition dirs for pruning, bounded
    file sizes, and an optional within-partition sort so parquet zone
    maps (rowgroup min/max) are selective for ``sort_by`` predicates."""
    fmt = format.lower()
    if fmt not in ("parquet", "orc"):
        raise ValueError("write_partitioned targets columnar formats (parquet/orc)")
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    w = df.write.mode(mode).format(fmt).option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)
