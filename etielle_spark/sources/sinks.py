"""Write sinks for ``load()`` / ``for_each_batch``.

The builder calls ``sink.write(table, df)`` in topological (parents-first)
order (reference flush ordering: etielle/fluent.py:1596-1626).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame


class Sink:
    def write(self, table: str, df: DataFrame) -> None:  # pragma: no cover
        raise NotImplementedError


class ParquetSink(Sink):
    """One parquet dataset per table under ``root``; ``mode='append'`` for
    streaming flushes, 'overwrite' for batch runs."""

    def __init__(self, root: str, mode: str = "overwrite", partition_by: Optional[list[str]] = None):
        self.root = root
        self.mode = mode
        self.partition_by = partition_by or []

    def write(self, table: str, df: DataFrame) -> None:
        w = df.write.mode(self.mode)
        if self.partition_by:
            cols = [c for c in self.partition_by if c in df.columns]
            if cols:
                w = w.partitionBy(*cols)
        w.parquet(os.path.join(self.root, table))


class CollectSink(Sink):
    """Test sink: collects rows driver-side per table."""

    def __init__(self) -> None:
        self.tables: dict[str, list[dict]] = {}

    def write(self, table: str, df: DataFrame) -> None:
        self.tables.setdefault(table, []).extend(
            r.asDict(recursive=True) for r in df.collect()
        )


class JdbcSink(Sink):
    """JDBC writer (reference SQLAlchemy sink equivalent).  Requires the
    driver jar on the classpath; exercised end-to-end against embedded
    Apache Derby (tests/test_jdbc_derby.py): topological flush, streaming
    upsert round trip, and two-phase FK against DB IDENTITY columns."""

    def __init__(self, url: str, *, mode: str = "append", batch_size: int = 1000, **options: str):
        self.url = url
        self.mode = mode
        self.batch_size = batch_size
        self.options = options

    def write(self, table: str, df: DataFrame) -> None:
        (
            df.write.mode(self.mode)
            .format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
            .option("batchsize", str(self.batch_size))
            .options(**self.options)
            .save()
        )
