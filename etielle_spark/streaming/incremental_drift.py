"""Incremental drift monitors for a continuously-ingested corpus:
vocabulary JS divergence and Population Stability Index maintained
across micro-batches — the monitors a production ingest runs
continuously instead of re-scanning history per check.

Both follow the repo's append-only-register streaming pattern
(streaming/incremental_sketch.py): per batch, ONE bounded aggregation
summarizes the new rows into (group, bucket/bin, cnt) count registers
(at most groups x buckets rows — KILOBYTES regardless of batch size)
which append to parquet state; no read-modify-write, no state-store
compaction.  Counts are ADDITIVE, so sum-merging the appended registers
at read time gives EXACTLY the distribution a batch pass over the
concatenated input would build — the drift scores are therefore
bit-identical to their batch twins (``operators/text.py:vocab_drift``,
``operators/profile.py:psi_drift``), which the differential tests
assert as equality.

PSI's bin edges are pinned at state creation from the reference group
(persisted in an ``_edges`` manifest beside the registers, validated on
reload) — the streaming contract is "score every batch against the
frozen baseline", which is what model monitoring means by PSI; a new
baseline is a new state dir.

Reference has no streaming analog; this extends the batch drift family
to the ingest path the way incremental_dedup.py does for LSH dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.profile import psi_bin_counts, psi_edges, psi_from_counts
from ..operators.text import js_from_counts, vocab_bucket_counts


class IncrementalVocabDrift:
    """Append-only (group, bucket, cnt) unigram registers under
    ``state_dir``; ``drift()`` scores the merged state with the exact
    batch ``vocab_drift`` math."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        *,
        text_col: str = "text",
        group_col: str = "lang",
        n_buckets: int = 1024,
        k: float = 1.0,
        round_to: int = 6,
        max_groups: int = 1000,
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.text_col = text_col
        self.group_col = group_col
        self.n_buckets = int(n_buckets)
        self.k = k
        self.round_to = round_to
        self.max_groups = max_groups

    def _state(self) -> DataFrame | None:
        try:
            files = self.spark.read.parquet(self.state_dir).inputFiles()
        except Exception:
            return None
        if not files:
            return None
        return self.spark.read.parquet(*files)

    def process_batch(self, df: DataFrame) -> None:
        """Fold one batch in: one tokenize+hash pass to at most
        groups x n_buckets count rows, appended to state."""
        vocab_bucket_counts(
            df, self.text_col, self.group_col, n_buckets=self.n_buckets
        ).write.mode("append").parquet(self.state_dir)

    def counts(self) -> DataFrame | None:
        """Merged (group, bucket, cnt) — the distribution a batch pass
        over every processed row would build, exactly."""
        state = self._state()
        if state is None:
            return None
        return state.groupBy("group", "bucket").agg(F.sum("cnt").alias("cnt"))

    def drift(self) -> DataFrame:
        """Pairwise JS divergence over the merged state — bit-identical
        to ``vocab_drift`` over the concatenated batches."""
        merged = self.counts()
        if merged is None:
            raise ValueError(
                "IncrementalVocabDrift.drift: no batches processed yet"
            )
        by_group: dict[str, dict[int, int]] = {}
        for r in merged.collect():  # groups x n_buckets rows — KB probe
            by_group.setdefault(r["group"], {})[int(r["bucket"])] = int(r["cnt"])
        if len(by_group) > self.max_groups:
            raise ValueError(
                f"IncrementalVocabDrift: {len(by_group)} groups exceeds "
                f"max_groups={self.max_groups} — groups are sources/"
                "snapshots, not entities."
            )
        return js_from_counts(
            self.spark,
            by_group,
            n_buckets=self.n_buckets,
            k=self.k,
            round_to=self.round_to,
        )

    def attach(self) -> "callable":
        """``foreachBatch`` adapter."""

        def _fn(df: DataFrame, batch_id: int) -> None:
            self.process_batch(df)

        return _fn


class IncrementalPSI:
    """Append-only (group, bin, cnt) registers with FROZEN reference-
    quantile bin edges; ``psi()`` scores the merged state with the exact
    batch ``psi_drift`` math."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        *,
        value_col: str,
        group_col: str,
        ref_group: str,
        bins: int = 10,
        k: float = 0.5,
        round_to: int = 6,
        max_groups: int = 10_000,
    ) -> None:
        if bins < 2:
            raise ValueError(f"IncrementalPSI: bins must be >= 2, got {bins}")
        self.spark = spark
        self.state_dir = state_dir
        self.value_col = value_col
        self.group_col = group_col
        self.ref_group = ref_group
        self.bins = int(bins)
        self.k = k
        self.round_to = round_to
        self.max_groups = max_groups
        self._edges_dir = state_dir.rstrip("/") + "/_edges"

    def _load_edges(self) -> list[float] | None:
        try:
            rows = self.spark.read.json(self._edges_dir).collect()
        except Exception:
            return None
        if not rows:
            return None
        r = rows[0]
        if int(r["bins"]) != self.bins:
            raise ValueError(
                f"IncrementalPSI: state at {self.state_dir} was built with "
                f"bins={int(r['bins'])}, not {self.bins} — a new binning is "
                "a new baseline; use a fresh state dir."
            )
        return [float(e) for e in r["edges"]]

    def _src(self, df: DataFrame) -> DataFrame:
        return df.filter(
            F.col(self.group_col).isNotNull() & F.col(self.value_col).isNotNull()
        ).select(
            F.col(self.group_col).cast("string").alias("__g"),
            F.col(self.value_col).cast("double").alias("__v"),
        )

    def process_batch(self, df: DataFrame) -> None:
        """Fold one batch in.  The FIRST batch must contain the
        reference group — its exact quantiles freeze the bin edges for
        the lifetime of the state (persisted + validated on reload)."""
        src = self._src(df)
        edges = self._load_edges()
        if edges is None:
            edges = psi_edges(
                src.filter(F.col("__g") == self.ref_group), "__v", bins=self.bins
            )
            if edges is None:
                raise ValueError(
                    f"IncrementalPSI: first batch has no rows for reference "
                    f"group {self.ref_group!r} — the baseline must arrive "
                    "before scoring starts"
                )
            self.spark.createDataFrame(
                [(self.bins, edges)], "bins long, edges array<double>"
            ).coalesce(1).write.mode("overwrite").json(self._edges_dir)
        psi_bin_counts(src, "__v", "__g", edges, bins=self.bins).write.mode(
            "append"
        ).parquet(self.state_dir)

    def counts(self) -> DataFrame | None:
        try:
            files = self.spark.read.parquet(self.state_dir).inputFiles()
        except Exception:
            return None
        if not files:
            return None
        return (
            self.spark.read.parquet(*files)
            .groupBy("group", "bin")
            .agg(F.sum("cnt").alias("cnt"))
        )

    def psi(self) -> DataFrame:
        """PSI of every group vs the frozen reference — bit-identical to
        ``psi_drift`` over the concatenated batches (the reference group
        fully present in batch one pins identical edges)."""
        merged = self.counts()
        if merged is None:
            raise ValueError("IncrementalPSI.psi: no batches processed yet")
        by_group: dict[str, dict[int, int]] = {}
        for r in merged.collect():  # groups x bins rows — KB probe
            by_group.setdefault(r["group"], {})[int(r["bin"])] = int(r["cnt"])
        if len(by_group) > self.max_groups:
            raise ValueError(
                f"IncrementalPSI: {len(by_group)} groups exceeds "
                f"max_groups={self.max_groups} — groups are sources/"
                "snapshots, not entities."
            )
        return psi_from_counts(
            self.spark,
            by_group,
            self.ref_group,
            bins=self.bins,
            k=self.k,
            round_to=self.round_to,
        )

    def attach(self) -> "callable":
        """``foreachBatch`` adapter."""

        def _fn(df: DataFrame, batch_id: int) -> None:
            self.process_batch(df)

        return _fn
