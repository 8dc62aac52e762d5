"""Incremental Count-Min heavy hitters for a continuously-ingested
corpus: the hot-terms / hot-domains report a training-data ingest keeps
live without re-scanning history per refresh.

State is two bounded families under ``state_dir``:

- **Sketch registers** — per batch, ONE bounded aggregation reduces the
  new rows to ``(groups..., j, b, cnt)`` CMS cells (at most
  ``|groups| * depth * width`` rows — KILOBYTES regardless of batch
  size).  CMS counts are ADDITIVE, so sum-merging the stored registers
  at read time gives EXACTLY the sketch a batch pass over the
  concatenated input would build.  Like the drift monitors' counts (and
  unlike bitmap-OR / max-merge registers), duplicated COUNT rows change
  the result, so each batch writes to a deterministic
  ``batch=<run_token>-b<id>`` directory with ``mode("overwrite")`` —
  ``foreachBatch`` replays overwrite the crashed attempt instead of
  appending beside it, and ``attach()`` requires a restart-stable token
  (explicit ``run_id`` or a ``checkpoint_location`` to derive one),
  exactly the incremental_drift contract.

- **Candidate sets** — a CMS can estimate any item's count but cannot
  ENUMERATE items, so each batch also records its own top
  ``candidate_k`` items per group by exact within-batch count (a
  bounded Misra-Gries-style pass) under ``state_dir/_cands`` (the
  underscore keeps it invisible to the register parquet reads), same
  overwrite-keyed layout.  ``heavy_hitters(k)`` estimates the UNION of
  all recorded candidates against the merged sketch.

Exactness contract: estimated counts equal the batch
``operators.sketches.cms_heavy_hitters`` estimates over the
concatenated input (identical md5 bucketing, additive register merge —
the differential test asserts equality).  Candidate RECALL is the one
approximation, and its bound is the standard frequent-items bound, NOT
batch-count-dependent:

    any item whose GLOBAL share (within its group) exceeds
    ``1/(candidate_k+1)`` is guaranteed recorded.

Proof sketch: global share is the batch-weighted average of per-batch
shares, so share > 1/(k+1) globally forces share > 1/(k+1) within some
batch; in that batch at most k items can have count >= its count
(k+1 items each above a 1/(k+1) share would exceed the batch), so it
ranks in that batch's top ``candidate_k`` and is recorded.  This is the
same guarantee a cross-batch-merged Misra-Gries summary of capacity
``candidate_k`` provides — carrying merged MG state across batches
would add machinery without strengthening the bound.  The converse is
equally tight: an item pinned at rank ``candidate_k+1`` in EVERY batch
(the adversarial drip) necessarily has global share <= 1/(candidate_k+1)
— it is not a guaranteed-reportable heavy hitter at this capacity in
ANY deterministic k-summary, and the drip test pins both directions.
Sizing rule: to guarantee items of global share s, set
``candidate_k >= ceil(1/s) - 1`` (e.g. 1% items -> candidate_k=99) —
independent of batch count and skew layout.

Reference has no streaming-sketch analog; this extends the incremental
family (incremental_sketch.py's HLL, incremental_drift.py's monitors)
with the counts-shaped sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.sketches import cms_cells, cms_estimate_topk
from .incremental_drift import (
    _attach_token,
    _merged_counts,
    _write_registers,
)


class IncrementalCMS:
    """Append-only CMS register + candidate state under ``state_dir``."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        *,
        item_col: str,
        group_cols: list[str] | None = None,
        depth: int = 4,
        width: int = 256,
        candidate_k: int = 64,
        max_groups: int = 1000,
        run_id: str | None = None,
    ) -> None:
        import uuid

        if depth < 1 or width < 2:
            raise ValueError(
                f"IncrementalCMS: need depth >= 1 and width >= 2, "
                f"got {depth}x{width}"
            )
        if candidate_k < 1:
            raise ValueError("IncrementalCMS: candidate_k must be >= 1")
        self.spark = spark
        self.state_dir = state_dir
        self.item_col = item_col
        self.group_cols = list(group_cols or [])
        self.depth = int(depth)
        self.width = int(width)
        self.candidate_k = int(candidate_k)
        self.max_groups = int(max_groups)
        self._explicit_run_id = run_id is not None
        self.run_token = run_id or uuid.uuid4().hex[:12]
        self._cands_dir = state_dir.rstrip("/") + "/_cands"
        self._meta_dir = state_dir.rstrip("/") + "/_meta"
        self._meta_checked = False

    def _check_meta(self) -> None:
        """Validate (depth, width) against the persisted manifest —
        registers hashed under different params merge into garbage, and
        (unlike the bloom index) the original items are gone, so a
        mismatch raises instead of rebuilding.  Writes the manifest on
        first contact; idempotent thereafter (cached on the instance —
        the monitor owns the dir)."""
        if self._meta_checked:
            return
        from .manifest import read_json_rows, write_json_rows

        rows = read_json_rows(self.spark, self._meta_dir)
        if rows:
            d, w = int(rows[0]["depth"]), int(rows[0]["width"])
            if (d, w) != (self.depth, self.width):
                raise ValueError(
                    f"IncrementalCMS: state at {self.state_dir} was built "
                    f"with depth={d}, width={w}, not "
                    f"{self.depth}x{self.width} — a new sketch geometry is "
                    "a new baseline; use a fresh state dir."
                )
        else:
            write_json_rows(
                self.spark,
                self._meta_dir,
                [{"depth": self.depth, "width": self.width}],
            )
        self._meta_checked = True

    def _occurrences(self, df: DataFrame) -> DataFrame:
        """NULL items AND NULL group keys are dropped at the source (the
        drift monitors' filter discipline) — a NULL group would write
        register dead weight that the estimate equi-join can never
        surface."""
        occ = df.select(
            *self.group_cols,
            F.col(self.item_col).cast("string").alias("__item"),
        ).filter(F.col("__item").isNotNull())
        for g in self.group_cols:
            occ = occ.filter(F.col(g).isNotNull())
        return occ

    def _batch_candidates(self, occ: DataFrame) -> DataFrame:
        """This batch's top ``candidate_k`` items per group by EXACT
        within-batch count — a bounded frame (|groups| x candidate_k)."""
        counts = occ.groupBy(*self.group_cols, "__item").agg(
            F.count(F.lit(1)).alias("__c")
        )
        if not self.group_cols:
            return (
                counts.orderBy(F.col("__c").desc(), F.col("__item").asc())
                .limit(self.candidate_k)
                .select("__item")
            )
        from pyspark.sql import Window

        w = Window.partitionBy(*self.group_cols).orderBy(
            F.col("__c").desc(), F.col("__item").asc()
        )
        return (
            counts.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= self.candidate_k)
            .select(*self.group_cols, "__item")
        )

    def process_batch(self, df: DataFrame, batch_id=None, *, _token=None) -> None:
        """Fold one batch in: one bounded cells aggregation + one bounded
        candidate pass.  Pass the ``foreachBatch`` batch_id for
        replay-idempotent storage."""
        self._check_meta()
        occ = self._occurrences(df)
        token = _token or self.run_token
        _write_registers(
            cms_cells(occ, self.group_cols, depth=self.depth, width=self.width),
            self.state_dir,
            token,
            batch_id,
        )
        _write_registers(
            self._batch_candidates(occ), self._cands_dir, token, batch_id
        )

    def sketch(self) -> DataFrame | None:
        """Merged ``(groups..., j, b, cnt)`` — exactly the CMS a batch
        pass over every processed row would build."""
        self._check_meta()
        return _merged_counts(
            self.spark, self.state_dir, ["j", "b"], group_cols=self.group_cols
        )

    def _candidates(self) -> DataFrame | None:
        """Distinct recorded candidates (live batch dirs + compaction
        epochs), or None when the _cands dir has never been written (a
        crash between the register write and the candidate write on a
        manually-driven first batch — foreachBatch replays repair it,
        manual loops surface an empty report rather than a raw path
        error)."""
        from .compaction import live_register_files

        files = live_register_files(self.spark, self._cands_dir)
        if not files:
            return None
        return (
            self.spark.read.parquet(*files)
            .select(*self.group_cols, "__item")
            .distinct()
        )

    def compact(self, *, keep_recent: int = 4) -> bool:
        """Fold old batch dirs into consolidated epochs — additive
        sum-merge for the CMS cells, set-distinct for the candidate
        records; both are the read-time algebra, so the fold is
        lossless.  See streaming/compaction.py."""
        from .compaction import compact_registers, distinct_rows, sum_counts

        a = compact_registers(
            self.spark, self.state_dir, sum_counts, keep_recent=keep_recent
        )
        b = compact_registers(
            self.spark, self._cands_dir, distinct_rows, keep_recent=keep_recent
        )
        return a or b

    def heavy_hitters(self, k: int = 10) -> DataFrame:
        """Top-``k`` per group by merged-sketch estimate over every
        recorded candidate: ``(*group_cols, item, est_count)``, the
        batch ``cms_heavy_hitters`` output shape.  The sketch is a
        bounded driver-safe frame; the candidate union is
        |groups| x candidate_k x batches at worst, deduped before the
        broadcast estimate join."""
        sketch = self.sketch()
        cands = self._candidates()
        if sketch is None:
            raise ValueError("IncrementalCMS.heavy_hitters: no batches yet")
        if cands is None:
            # registers exist but the candidate write never landed (crash
            # between the two writes, never replayed): report empty
            # rather than raising a raw path error.  Group column types
            # come from the merged sketch (not a hardcoded string) so the
            # fallback schema matches cms_estimate_topk's output for
            # non-string group keys — unions/writers downstream are
            # schema-sensitive.
            from pyspark.sql.types import LongType, StringType, StructField, StructType

            fields = [
                StructField(g, sketch.schema[g].dataType, True)
                for g in self.group_cols
            ]
            fields += [
                StructField("item", StringType(), True),
                StructField("est_count", LongType(), True),
            ]
            return self.spark.createDataFrame([], StructType(fields))
        if self.group_cols:
            ng = (
                sketch.select(*self.group_cols)
                .distinct()
                .limit(self.max_groups + 1)
                .count()
            )
            if ng > self.max_groups:
                raise ValueError(
                    f"IncrementalCMS: more than max_groups={self.max_groups} "
                    "distinct groups — groups are sources/snapshots, not "
                    "entities."
                )
        return cms_estimate_topk(
            sketch,
            cands,
            self.group_cols,
            depth=self.depth,
            width=self.width,
            k=k,
        )

    def attach(
        self,
        checkpoint_location: str | None = None,
        *,
        compact_every: int | None = None,
    ) -> "callable":
        """``foreachBatch`` adapter (forwards the batch_id for replay
        idempotence).  Restart safety requires a restart-stable token:
        pass ``checkpoint_location`` (the writeStream's
        ``checkpointLocation``) to derive one, or construct the monitor
        with an explicit ``run_id``; otherwise this raises — the
        incremental_drift contract.  ``compact_every=N`` folds old
        register AND candidate batch dirs into consolidated epochs
        every N batches from inside the callback (the single writer)."""
        token = _attach_token(self, checkpoint_location)

        def _fn(df: DataFrame, batch_id: int) -> None:
            self.process_batch(df, batch_id=batch_id, _token=token)
            if compact_every and batch_id % compact_every == compact_every - 1:
                self.compact()

        return _fn
