"""Write sinks for ``load()`` / ``for_each_batch``.

The builder calls ``sink.write(table, df)`` in topological (parents-first)
order (reference flush ordering: etielle/fluent.py:1596-1626).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame


class Sink:
    #: flush-order contract: True (default) = tables must be written
    #: parents-first (relational FK sinks); False = writes are
    #: order-independent (path-per-table sinks) and MAY be overlapped
    ordered = True

    def write(self, table: str, df: DataFrame) -> None:  # pragma: no cover
        raise NotImplementedError


class ParquetSink(Sink):
    """One parquet dataset per table under ``root``; ``mode='append'`` for
    streaming flushes, 'overwrite' for batch runs.  Table dirs are
    independent paths, so flush order is unobservable (``ordered =
    False``: ``for_each_batch`` may overlap the per-table write jobs)."""

    ordered = False

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
    upsert round trip, and two-phase FK against DB IDENTITY columns.

    ``on_batch(table, done, total)`` is the progress seam (reference
    ``insert_batches``'s per-batch callback,
    adapters/supabase_adapter.py:14-71).  The reference pages row
    batches through one driver connection; Spark writes one JDBC
    connection PER PARTITION on the executors, so the honest unit of
    progress here is the partition: while the write job runs, a monitor
    thread polls the status tracker and reports completed/total write
    tasks, with a final ``(total, total)`` call after the save returns.
    Callback exceptions are swallowed (telemetry convention).
    """

    def __init__(
        self,
        url: str,
        *,
        mode: str = "append",
        batch_size: int = 1000,
        on_batch=None,
        poll_interval: float = 0.2,
        **options: str,
    ):
        self.url = url
        self.mode = mode
        self.batch_size = batch_size
        self.on_batch = on_batch
        self.poll_interval = poll_interval
        self.options = options

    def _save(self, table: str, df: DataFrame) -> None:
        (
            df.write.mode(self.mode)
            .format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
            .option("batchsize", str(self.batch_size))
            .options(**self.options)
            .save()
        )

    def _emit(self, table: str, done: int, total: int) -> None:
        try:
            self.on_batch(table, done, total)
        except Exception:
            pass

    def write(self, table: str, df: DataFrame) -> None:
        if self.on_batch is None:
            self._save(table, df)
            return

        import threading
        import uuid

        sc = df.sparkSession.sparkContext
        group = f"jdbc-sink-{uuid.uuid4().hex}"
        stop = threading.Event()
        seen: dict[str, int] = {"done": -1, "total": 0}

        def poll() -> None:
            tracker = sc.statusTracker()
            while not stop.is_set():
                try:
                    done = total = 0
                    for job_id in tracker.getJobIdsForGroup(group):
                        info = tracker.getJobInfo(job_id)
                        if info is None:
                            continue
                        for sid in info.stageIds:
                            st = tracker.getStageInfo(sid)
                            if st is None:
                                continue
                            done += st.numCompletedTasks
                            total += st.numTasks
                    if total and done != seen["done"]:
                        seen["done"], seen["total"] = done, total
                        self._emit(table, done, total)
                except Exception:
                    pass
                stop.wait(self.poll_interval)

        sc.setJobGroup(group, f"JdbcSink write {table}")
        t = threading.Thread(target=poll, daemon=True)
        t.start()
        try:
            self._save(table, df)
        finally:
            stop.set()
            t.join(timeout=5)
            try:
                sc.setJobGroup(None, None)
            except Exception:
                sc.setLocalProperty("spark.jobGroup.id", None)
        total = seen["total"] or df.rdd.getNumPartitions()
        if (seen["done"], seen["total"]) != (total, total):
            self._emit(table, total, total)
