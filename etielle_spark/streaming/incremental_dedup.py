"""Incremental near-duplicate detection for a continuously-ingested
corpus: each new batch of documents is checked against itself AND all
previously-seen documents without recomputing old signatures.

This is the shape a 100 TB ingest pipeline needs — the historical corpus
is summarized by its (id, band, band_digest) LSH index (a few rows of
32-byte digests per document, ~1% of corpus bytes), stored as append-only
parquet:

- per batch, signatures are computed ONLY for the new documents;
- new-vs-new and new-vs-history candidates come from equi-joins on
  (band, band_digest) — the historical side is never re-shingled;
- the batch's digest rows are appended to the index (one parquet append,
  no state-store compaction; partition the index dir by band digest
  prefix externally if bucket files grow large);
- ``max_bucket_size`` stop-lists boilerplate buckets on the history side,
  bounding the pair blow-up from "too common to pair" content.

Drive it from Structured Streaming via ``foreachBatch`` (see
``attach``) or call :meth:`IncrementalLSHDedup.process_batch` directly
from any batch loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.dedup import band_digests
from .incremental_drift import _path_missing


class IncrementalLSHDedup:
    """Maintains a persistent LSH band-digest index and emits candidate
    near-duplicate pairs per processed batch.

    ``index_dir`` holds (doc_id, band, band_digest) parquet.  Pair
    emission is exactly-once per (a, b) pair as long as ids are unique
    across batches (re-delivered batches re-emit their pairs; make the
    sink idempotent on (id_a, id_b) for end-to-end exactly-once).
    """

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        num_hashes: int = 8,
        bands: int = 4,
        max_bucket_size: int | None = None,
    ) -> None:
        self.spark = spark
        self.index_dir = index_dir
        self.id_col = id_col
        self.text_col = text_col
        self.n = n
        self.num_hashes = num_hashes
        self.bands = bands
        self.max_bucket_size = max_bucket_size
        self._meta_checked = False

    def _check_meta(self) -> None:
        """(n, num_hashes, bands) pin for the persistent index — band
        digests hashed under different params equi-join into silence
        (every cross-batch pair missed, no error), the same hazard class
        the CMS/PSI/bloom manifests close.  Raises on mismatch; writes
        the manifest on first contact (cached per instance)."""
        if self._meta_checked:
            return
        from .incremental_drift import _check_geometry

        _check_geometry(
            self.spark,
            self.index_dir.rstrip("/") + "/_meta",
            "IncrementalLSHDedup",
            self.index_dir,
            {"n": self.n, "num_hashes": self.num_hashes, "bands": self.bands},
        )
        self._meta_checked = True

    def _index(self) -> DataFrame | None:
        """The index as of NOW, pinned to the current file list: a later
        append must not leak into this snapshot even if a lost partition
        is recomputed after the append (lineage re-lists the directory;
        an explicit file list doesn't)."""
        try:
            files = self.spark.read.parquet(self.index_dir).inputFiles()
        except Exception as e:
            if _path_missing(e):
                return None
            # a transient storage/permission error must SURFACE: reading
            # it as "no history" would emit only within-batch pairs while
            # still appending this batch's digests — every cross-batch
            # duplicate pair for this batch silently lost forever (the
            # IncrementalExactDedup._index_files contract)
            raise
        if not files:
            return None
        return self.spark.read.parquet(*files)

    def _candidate_pairs(self, new: DataFrame) -> DataFrame:
        """Banded pairs for a digest frame: within the frame itself plus
        against the persisted index as of now — the shared join shape of
        ``process_batch`` (which then appends) and ``query`` (which
        doesn't)."""
        l, r = new.alias("l"), new.alias("r")
        id_c = self.id_col
        # the batch side is micro by the streaming contract — broadcast
        # it EXPLICITLY so the strategy holds at any history size (an
        # estimate-driven plan broadcasts whichever side looks small,
        # and at corpus scale that degrades to a full-history shuffle
        # per batch; guide §3.1)
        within = l.join(
            F.broadcast(r),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_digest") == F.col("r.band_digest"))
            & (F.col(f"l.{id_c}") < F.col(f"r.{id_c}")),
        ).select(
            F.col(f"l.{id_c}").alias("id_a"), F.col(f"r.{id_c}").alias("id_b")
        )

        hist = self._index()
        if hist is not None:
            if self.max_bucket_size is not None:
                # same skew-safe stop-list shape as lsh_candidate_pairs:
                # map-side-combined groupBy count + left-semi, never a
                # digest-keyed window
                ok = (
                    hist.groupBy("band", "band_digest")
                    .agg(F.count(F.lit(1)).alias("__bsz"))
                    .filter(F.col("__bsz") <= self.max_bucket_size)
                    .select("band", "band_digest")
                )
                hist = hist.join(ok, ["band", "band_digest"], "left_semi")
            # stream the (arbitrarily large) history through a broadcast
            # hash join against the micro-batch: the history is never
            # shuffled and never broadcast, whatever its size
            h = hist.alias("h")
            cross = F.broadcast(new.alias("n")).join(
                h,
                (F.col("n.band") == F.col("h.band"))
                & (F.col("n.band_digest") == F.col("h.band_digest")),
            ).select(
                F.least(F.col(f"n.{id_c}"), F.col(f"h.{id_c}")).alias("id_a"),
                F.greatest(F.col(f"n.{id_c}"), F.col(f"h.{id_c}")).alias("id_b"),
            )
            pairs = within.union(cross)
        else:
            pairs = within
        return pairs.filter(F.col("id_a") != F.col("id_b")).distinct()

    def query(self, docs: DataFrame) -> DataFrame:
        """Read-only probe: candidate pairs between ``docs`` and the
        index as of now (plus among ``docs`` themselves), WITHOUT
        appending anything — admission control at ingest ("is this a
        near-dup of the corpus so far?") or ad-hoc contamination checks
        against a frozen index.  Lazy: no action runs here, and the
        file-list pin in ``_index`` keeps the result stable even if a
        concurrent ``process_batch`` appends after this returns."""
        self._check_meta()
        new = band_digests(
            docs, self.id_col, self.text_col,
            n=self.n, num_hashes=self.num_hashes, bands=self.bands,
        )
        return self._candidate_pairs(new)

    def process_batch(self, docs: DataFrame) -> DataFrame:
        """Returns the candidate pairs this batch introduces, as
        ``(id_a, id_b)`` with ``id_a < id_b``, deduplicated across bands;
        then appends the batch's digests to the index.

        The pair plan is built against the PRE-append index snapshot —
        ``_candidate_pairs`` pins the history to the file list as of
        now, so the append below cannot leak into it — which means the
        returned frame can stay LAZY: the only job this method runs is
        the index append (which also fills the batch's digest cache).
        The digest cache is released on the next ``process_batch`` /
        ``release_batch_cache()`` / ``attach``'s per-batch cleanup.
        """
        self._check_meta()
        self.release_batch_cache()
        new = band_digests(
            docs, self.id_col, self.text_col,
            n=self.n, num_hashes=self.num_hashes, bands=self.bands,
        ).persist()

        # plan (and pin the pre-append file list) BEFORE the append
        out = self._candidate_pairs(new).persist()

        # one job: materializes `new` into its cache and appends it; the
        # caller's first action on `out` reads the cached digests
        new.write.mode("append").parquet(self.index_dir)
        self._batch_cache = new
        return out

    def release_batch_cache(self) -> None:
        """Free the current batch's digest cache (kept so the lazy pair
        frame reads cached signatures, not a recompute).  Safe once the
        batch's pairs have been consumed; the pair frame stays usable
        (Spark recomputes from lineage)."""
        cache = getattr(self, "_batch_cache", None)
        if cache is not None:
            cache.unpersist()
            self._batch_cache = None

    def compact(self, *, min_files: int = 16, target_files: int = 1) -> bool:
        """Rewrite the per-batch band-digest files as ``target_files``
        consolidated files (corpus-scale index: size to ~100M rows/file
        on a cluster so the rewrite parallelizes).  History rows are
        probed by equi-join and the emitted pairs are
        distinct()-deduped, so the crash window where old and new files
        coexist is EXACT (see streaming/compaction.py)."""
        from .compaction import compact_flat_parquet

        return bool(
            compact_flat_parquet(
                self.spark,
                self.index_dir,
                min_files=min_files,
                target_files=max(1, int(target_files)),
            )
        )

    def attach(self, sink, *, compact_every: int | None = None) -> "callable":
        """``foreachBatch`` adapter: returns a ``(df, batch_id)`` callable
        that processes each micro-batch and hands the emitted pairs to
        ``sink(pairs_df, batch_id)``.  ``compact_every=N`` rewrites the
        per-batch index files as one every N batches (idempotent, so
        any crash window is exact) — without it a months-running stream
        pays O(batches) file-listing cost per probe."""

        def _fn(df: DataFrame, batch_id: int) -> None:
            out = self.process_batch(df)
            try:
                sink(out, batch_id)
            finally:
                if compact_every and batch_id % compact_every == compact_every - 1:
                    # the caller chose the cadence: fold whatever is there
                    self.compact(min_files=2)
                # `out` IS the frame process_batch persisted — releasing
                # it (and the batch digest cache) here keeps a
                # long-running stream from accumulating one pair cache
                # per micro-batch
                out.unpersist()
                self.release_batch_cache()

        return _fn


class IncrementalExactDedup:
    """Exact (content-hash) dedup across micro-batches: the historical
    corpus is summarized by its ``md5(text)`` digest set stored as
    append-only parquet; each batch drops rows whose digest was already
    seen (in history or earlier in the same batch) and appends the
    survivors' digests.

    This is the first stage of a streaming ingest pipeline — it runs
    BEFORE near-dup LSH (:class:`IncrementalLSHDedup`), and its index is
    one 32-byte digest per unique document ever seen.  Within a batch the
    keeper is the smallest id (deterministic); against history any match
    drops.

    ``bloom_bits`` (optional) maintains a Bloom filter over the digest
    history as append-only bitmap-word parquet beside the index (see
    operators/sketches.py:bloom_build).  With it, each batch probes the
    broadcast-sized word table first: bloom-negative rows are
    *definitely* new and skip the history anti-join entirely, and a
    batch with zero bloom-positives never scans the digest index at all
    — at 100 TB the index is billions of digest rows, so mostly-novel
    ingest stops paying a full index scan per micro-batch.  Results are
    exact either way (positives are still confirmed by the anti-join).

    Exactness of the bloom path requires the filter to cover EVERY
    history digest — a lagging filter would wave real duplicates
    through as "definitely new".  The filter is therefore synced by
    INDEX FILE LIST before every probe: a ``_covered`` manifest beside
    the word parquet records which index files have been folded in, and
    any uncovered files (bloom enabled on a pre-existing index, a crash
    between the index append and the bloom append, batches run with
    bloom disabled) are backfilled from the index itself before the
    probe.  ``num_bits``/``num_hashes`` are persisted in a ``_meta``
    manifest and validated on load — a parameter change triggers a full
    deterministic rebuild instead of probing misaligned bit positions.
    Every sync step is idempotent (bloom appends are bitmap ORs), so a
    crash anywhere errs toward false positives, never false negatives.
    """

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        bloom_bits: int | None = None,
        bloom_hashes: int = 5,
    ) -> None:
        self.spark = spark
        self.index_dir = index_dir
        self.id_col = id_col
        self.text_col = text_col
        self.bloom_bits = bloom_bits
        self.bloom_hashes = bloom_hashes
        self.bloom_dir = index_dir.rstrip("/") + "_bloom"
        # manifest state cached after the first disk read: the monitor
        # OWNS the bloom dir, so in-memory updates on append stay exact
        # and the per-batch probe stops paying two JSON reads + a
        # file-diff recompute (the round-6 +17% on
        # streaming_incremental_dedup).  (None, None) means "not read
        # yet"; a crashed writer can't invalidate the cache because every
        # cache update happens AFTER the corresponding manifest write.
        self._meta_cache: tuple[int, int] | None = None
        self._covered_cache: set[str] | None = None
        self._words_cache: DataFrame | None = None
        self._batch_cache: DataFrame | None = None

    def _index_files(self) -> list[str]:
        try:
            return sorted(self.spark.read.parquet(self.index_dir).inputFiles())
        except Exception as e:
            if _path_missing(e):
                return []
            # a transient storage/permission error must SURFACE: reading
            # it as "no history" would skip the anti-join and emit
            # previously-seen digests as new
            raise

    def _read_meta(self) -> tuple[int, int] | None:
        """Persisted (num_bits, num_hashes) of the on-disk filter —
        driver-side read (streaming/manifest.py), no Spark job."""
        from .manifest import read_json_rows

        rows = read_json_rows(self.spark, self.bloom_dir + "/_meta")
        if not rows:
            return None
        return int(rows[0]["num_bits"]), int(rows[0]["num_hashes"])

    def _read_covered(self) -> set[str]:
        """Index files already folded into the on-disk filter."""
        from .manifest import read_json_rows

        rows = read_json_rows(self.spark, self.bloom_dir + "/_covered")
        return {r["file"] for r in rows} if rows else set()

    def _sync_bloom(self, idx_files: list[str]) -> None:
        """Bring the word table up to cover every file in ``idx_files``.

        Parameter mismatch with the persisted ``_meta`` rebuilds the
        whole filter from the index (misaligned bit positions are never
        probed); otherwise only uncovered files are backfilled.  Word
        appends are bitmap ORs, so replaying a step after a crash is
        harmless (duplicate fold-ins set the same bits)."""
        from ..operators.sketches import bloom_build

        meta = self._meta_cache if self._meta_cache is not None else self._read_meta()
        params = (int(self.bloom_bits), int(self.bloom_hashes))
        rebuild = meta is not None and meta != params
        if rebuild:
            covered: set[str] = set()
        elif self._covered_cache is not None:
            covered = self._covered_cache
        else:
            covered = self._read_covered()
        uncovered = sorted(set(idx_files) - covered)
        if not uncovered and not rebuild and meta is not None:
            self._meta_cache = meta
            self._covered_cache = covered
            return
        if uncovered:
            digests = self.spark.read.parquet(*uncovered).select("digest")
            bloom_build(
                digests,
                "digest",
                num_bits=self.bloom_bits,
                num_hashes=self.bloom_hashes,
            ).write.mode("overwrite" if rebuild else "append").parquet(
                self.bloom_dir
            )
        elif rebuild:
            # params changed before any index exists: drop the old words
            empty = self.spark.createDataFrame([], "digest string")
            bloom_build(
                empty,
                "digest",
                num_bits=self.bloom_bits,
                num_hashes=self.bloom_hashes,
            ).write.mode("overwrite").parquet(self.bloom_dir)
        from .manifest import write_json_rows

        write_json_rows(
            self.spark,
            self.bloom_dir + "/_meta",
            [{"num_bits": params[0], "num_hashes": params[1]}],
        )
        all_covered = covered | set(uncovered)
        write_json_rows(
            self.spark,
            self.bloom_dir + "/_covered",
            [{"file": f} for f in sorted(all_covered)],
        )
        # caches updated only after both manifests are durably written,
        # so a crash mid-sync re-reads the true state next time — and the
        # word table changed, so the merged-words cache is stale
        self._meta_cache = params
        self._covered_cache = all_covered
        if self._words_cache is not None:
            self._words_cache.unpersist()
            self._words_cache = None

    def _bloom_words(self, idx_files: list[str]) -> DataFrame | None:
        """The filter as one OR-merged word table, synced to cover
        exactly the given index snapshot (or a superset of it).  The
        merged table is persisted on the instance and reused until a
        sync appends/rebuilds words — steady-state batches probe a
        cached, already-merged filter instead of re-scanning and
        re-merging every word file."""
        self._sync_bloom(idx_files)
        if self._words_cache is not None:
            return self._words_cache
        try:
            files = self.spark.read.parquet(self.bloom_dir).inputFiles()
        except Exception as e:
            if _path_missing(e):
                return None
            raise
        if not files:
            return None
        # Per-batch word tables append; OR them back into one filter.
        words = (
            self.spark.read.parquet(*files)
            .groupBy("word_idx")
            .agg(F.bit_or("word").alias("word"))
            .persist()
        )
        self._words_cache = words
        return words

    def process_batch(self, docs: DataFrame) -> DataFrame:
        """Returns the batch's surviving rows (first occurrence of each
        new digest) and appends their digests to the index.  Materializes
        the survivors (the anti-join must run against the pre-append
        index)."""
        digested = docs.withColumn(
            "__digest", F.md5(F.col(self.text_col))
        )
        from pyspark.sql import Window

        w = Window.partitionBy("__digest").orderBy(F.col(self.id_col))
        first_in_batch = (
            digested.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .drop("__rk")
        )
        idx_files = self._index_files()
        hist = self.spark.read.parquet(*idx_files) if idx_files else None
        words = (
            self._bloom_words(idx_files)
            if self.bloom_bits and hist is not None
            else None
        )
        if hist is not None and words is not None:
            from ..operators.sketches import bloom_probe

            flagged = bloom_probe(
                first_in_batch,
                words,
                "__digest",
                num_bits=self.bloom_bits,
                num_hashes=self.bloom_hashes,
                flag="__bf",
            ).persist()
            definite_new = flagged.filter(~F.col("__bf")).drop("__bf")
            candidates = flagged.filter(F.col("__bf")).drop("__bf")
            confirmed = candidates.join(
                hist, candidates["__digest"] == hist["digest"], "left_anti"
            )
            survivors = definite_new.unionByName(confirmed)
        elif hist is not None:
            flagged = None
            survivors = first_in_batch.join(
                hist, first_in_batch["__digest"] == hist["digest"], "left_anti"
            )
        else:
            flagged = None
            survivors = first_in_batch
        survivors = survivors.persist()
        # the append is the materializing action: it computes `survivors`
        # into its cache while writing the digests (history is pinned to
        # `idx_files` above, so the append can't leak into the plan) —
        # no separate count() pass needed
        survivors.select(F.col("__digest").alias("digest")).write.mode(
            "append"
        ).parquet(self.index_dir)
        # No bloom append here: the next batch's _sync_bloom folds the new
        # index file in by file list, so a crash at ANY point leaves the
        # filter either current or strictly behind-and-detectable — never
        # silently missing digests.
        if flagged is not None:
            flagged.unpersist()
        # the PERSISTED plan is `survivors`, not the drop() projection
        # returned below — Spark's non-cascading uncache matches on the
        # exact plan, so callers unpersisting the returned frame free
        # nothing.  Track the cache on the instance: attach() releases it
        # after the sink consumes each batch, and release_batch_cache()
        # serves manual loops.
        self._batch_cache = survivors
        return survivors.drop("__digest")

    def release_batch_cache(self) -> None:
        """Free the current batch's survivor cache (persisted by
        :meth:`process_batch` for its index-append barrier).  Safe after
        the batch's output has been consumed; the returned frame stays
        usable (Spark recomputes from lineage)."""
        cache = getattr(self, "_batch_cache", None)
        if cache is not None:
            cache.unpersist()
            self._batch_cache = None

    def close(self) -> None:
        """Release every cache the monitor owns: the current batch's
        survivors AND the long-lived OR-merged bloom word table.  Call
        when the stream stops; a new batch rebuilds what it needs from
        the on-disk state."""
        self.release_batch_cache()
        if self._words_cache is not None:
            self._words_cache.unpersist()
            self._words_cache = None

    def compact(self, *, min_files: int = 16, target_files: int = 1) -> bool:
        """Rewrite the per-batch digest index files (and bloom word
        files, when enabled) as ``target_files`` consolidated files.
        Digest rows are probed by anti-join and word rows OR-merge —
        both idempotent — so the crash window where old and new files
        coexist is EXACT (see streaming/compaction.py).  Bounds the
        per-batch index scan and bloom sync at O(target_files) +
        O(since-compaction) appends.

        ``target_files=1`` suits local/small state; at cluster scale the
        index is billions of digest rows — size ``target_files`` to
        ~100M rows/file so the rewrite parallelizes instead of
        funnelling through one task.

        Single writer: call between batches (the instance owns the dir).
        """
        from .compaction import _hadoop_delete, compact_flat_parquet

        old = self._index_files()
        if len(old) < min_files:
            return False
        if self.bloom_bits is not None:
            # cover the ENTIRE pre-compaction file list first, so the
            # consolidated file's content is provably already folded in
            # and the _covered swap below cannot mark un-folded digests
            # as covered (that would be a false-negative machine)
            self._sync_bloom(old)
        self.spark.read.parquet(*old).coalesce(
            max(1, int(target_files))
        ).write.mode("append").parquet(self.index_dir)
        new = sorted(set(self._index_files()) - set(old))
        for f in old:
            _hadoop_delete(self.spark, f, False)
        if self.bloom_bits is not None and self._covered_cache is not None:
            from .manifest import write_json_rows

            covered = (self._covered_cache - set(old)) | set(new)
            write_json_rows(
                self.spark,
                self.bloom_dir + "/_covered",
                [{"file": f} for f in sorted(covered)],
            )
            self._covered_cache = covered
            # word content unchanged; compact the word FILES too and
            # drop the merged-words cache (it pins the old file list)
            compact_flat_parquet(
                self.spark,
                self.bloom_dir,
                merge=lambda df: df.groupBy("word_idx").agg(
                    F.bit_or("word").alias("word")
                ),
                min_files=2,
            )
            if self._words_cache is not None:
                self._words_cache.unpersist()
                self._words_cache = None
        return True

    def attach(self, sink, *, compact_every: int | None = None) -> "callable":
        """``foreachBatch`` adapter like :meth:`IncrementalLSHDedup.attach`
        (``compact_every=N`` rewrites digest-index + bloom-word files
        every N batches)."""

        def _fn(df: DataFrame, batch_id: int) -> None:
            out = self.process_batch(df)
            try:
                sink(out, batch_id)
            finally:
                if compact_every and batch_id % compact_every == compact_every - 1:
                    # the caller chose the cadence: fold whatever is there
                    self.compact(min_files=2)
                # once the sink has consumed the batch the survivor cache
                # is dead weight across a long-running stream
                self.release_batch_cache()

        return _fn
