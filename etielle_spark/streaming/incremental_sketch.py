"""Incremental distinct-counting for a continuously-ingested corpus:
HyperLogLog register state maintained across micro-batches.

The 100 TB shape: the historical stream is summarized by at most
``m = 16**bucket_hex`` (group, bucket, rho) register rows per group —
KILOBYTES per group regardless of how many items flowed through — stored
as append-only parquet:

- per batch, registers are computed ONLY for the new rows (one bounded
  groupBy, output <= m rows per group);
- the batch's registers append to the state dir (no read-modify-write,
  no state-store compaction — register merge is ``max``, which is
  associative and idempotent, so merging at READ time over all appended
  snapshots gives exactly the registers a single batch pass would);
- ``estimate()`` folds the appended state with ``groupBy(bucket).max``
  and applies the standard HLL estimator — the result is EXACTLY equal
  to the batch computation over the concatenated input, not just close
  (max-merge loses nothing), which the differential test asserts.

Drive from Structured Streaming via ``attach`` (foreachBatch) or call
:meth:`IncrementalHLL.process_batch` from any batch loop.  Reference has
no streaming-sketch analog; this extends the repo's batch sketch family
(operators/sketches.py) to the ingest path like
streaming/incremental_dedup.py does for LSH dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.sketches import hll_estimate, hll_registers


class IncrementalHLL:
    """Append-only HLL register state per group under ``state_dir``."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        *,
        group_cols: list[str],
        item_col: str,
        bucket_hex: int = 3,
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.group_cols = list(group_cols)
        self.item_col = item_col
        self.bucket_hex = bucket_hex
        self._meta_checked = False

    def _check_meta(self) -> None:
        """bucket_hex pin for the register state — registers bucketed
        under a different m = 16**bucket_hex max-merge into garbage
        (same hazard class as the CMS geometry manifest).  Raises on
        mismatch; writes the manifest on first contact."""
        if self._meta_checked:
            return
        from .incremental_drift import _check_geometry

        _check_geometry(
            self.spark,
            self.state_dir.rstrip("/") + "/_meta",
            "IncrementalHLL",
            self.state_dir,
            {"bucket_hex": self.bucket_hex},
        )
        self._meta_checked = True

    def _state(self) -> DataFrame | None:
        """State pinned to the current file list (a concurrent append
        must not leak into a snapshot if a partition recomputes)."""
        from .incremental_drift import _path_missing

        try:
            files = self.spark.read.parquet(self.state_dir).inputFiles()
        except Exception as e:
            if _path_missing(e):
                return None
            # a transient storage error must SURFACE — "no state" here
            # would silently report an empty estimate over real history
            raise
        if not files:
            return None
        return self.spark.read.parquet(*files)

    def process_batch(self, df: DataFrame) -> None:
        """Fold one batch into the state: compute its registers (bounded
        output) and append them.  No merge happens at write time — the
        state stays append-only; merge cost is paid at estimate() over
        the (tiny) register rows."""
        self._check_meta()
        regs = hll_registers(
            df, self.group_cols, self.item_col, bucket_hex=self.bucket_hex
        )
        regs.write.mode("append").parquet(self.state_dir)

    def registers(self) -> DataFrame | None:
        """Current merged register state: max rho per (group, bucket)."""
        self._check_meta()
        state = self._state()
        if state is None:
            return None
        return state.groupBy(*self.group_cols, "bucket").agg(
            F.max("rho").alias("rho")
        )

    def estimate(self) -> DataFrame:
        """``(*group_cols, est_distinct)`` from the merged state; empty
        frame when no batch has been processed."""
        regs = self.registers()
        if regs is None:
            schema = ", ".join(f"{c} string" for c in self.group_cols)
            return self.spark.createDataFrame(
                [], schema + ", est_distinct double"
            )
        return hll_estimate(
            regs, self.group_cols, bucket_hex=self.bucket_hex
        )

    def compact(self, *, min_files: int = 8) -> bool:
        """Rewrite the appended register files as one max-merged file —
        the idempotent max makes the crash window where old and new
        files coexist EXACT, so no manifest protocol is needed (see
        streaming/compaction.py).  Bounds the estimate() read path at
        O(1) files + O(since-compaction) appends."""
        from .compaction import compact_flat_parquet

        def _max_merge(df: DataFrame) -> DataFrame:
            return df.groupBy(*self.group_cols, "bucket").agg(
                F.max("rho").alias("rho")
            )

        return bool(
            compact_flat_parquet(
                self.spark, self.state_dir, merge=_max_merge, min_files=min_files
            )
        )

    def attach(self):
        """``foreachBatch`` hook: ``writeStream.foreachBatch(inc.attach())``."""

        def _fn(df: DataFrame, batch_id: int) -> None:
            self.process_batch(df)

        return _fn
