"""Incremental drift monitors for a continuously-ingested corpus:
vocabulary JS divergence, Population Stability Index, and a binned
Kolmogorov-Smirnov statistic maintained across micro-batches — the
monitors a production ingest runs continuously instead of re-scanning
history per check.

All follow the repo's append-only-register streaming pattern
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


class IncrementalBinnedKS:
    """Streaming Kolmogorov-Smirnov over FROZEN quantile bins: the
    third monitor of the family — max CDF gap (tail-shape sensitive)
    beside PSI (mass-weighted) and vocab JS (content), maintained from
    the same kind of append-only (group, bin, cnt) registers.

    Exactness contract: the score equals batch
    ``operators.profile.ks_drift`` applied to the BIN-CENSORED values
    (each value replaced by its bin index) — i.e. the empirical CDFs are
    evaluated at the ``bins`` frozen edges instead of at every distinct
    value.  With quantile edges from the reference slice, the bin grid
    is exactly where the CDF mass sits, so the binned D converges to the
    exact D at 1/bins resolution; the trade is O(groups x bins) state
    regardless of how many rows or distinct values ever flow through —
    the property a continuous-feature stream needs.

    Edges freeze at state creation from ``edge_group``'s values in the
    first batch (persisted in the ``_edges`` manifest, validated on
    reload), mirroring :class:`IncrementalPSI`'s frozen-baseline
    contract.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        *,
        value_col: str,
        group_col: str,
        edge_group: str,
        bins: int = 64,
        round_to: int = 6,
        max_groups: int = 1000,
    ) -> None:
        if bins < 2:
            raise ValueError(f"IncrementalBinnedKS: bins must be >= 2, got {bins}")
        self.spark = spark
        self.state_dir = state_dir
        self.value_col = value_col
        self.group_col = group_col
        self.edge_group = edge_group
        self.bins = int(bins)
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
                f"IncrementalBinnedKS: state at {self.state_dir} was built "
                f"with bins={int(r['bins'])}, not {self.bins} — a new "
                "binning is a new baseline; use a fresh state dir."
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
        """Fold one batch in; the first batch's ``edge_group`` values
        freeze the bin edges."""
        src = self._src(df)
        edges = self._load_edges()
        if edges is None:
            edges = psi_edges(
                src.filter(F.col("__g") == self.edge_group), "__v", bins=self.bins
            )
            if edges is None:
                raise ValueError(
                    f"IncrementalBinnedKS: first batch has no rows for edge "
                    f"group {self.edge_group!r} — the baseline must arrive "
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

    def drift(self) -> DataFrame:
        """Pairwise binned-KS statistic ``(group_a, group_b, n_a, n_b,
        ks_stat)``, lexically ordered pairs — the groups x bins merged
        state is a KB driver probe, so the pairwise max-gap scan runs
        driver-side like the batch twins' score stages."""
        merged = self.counts()
        if merged is None:
            raise ValueError("IncrementalBinnedKS.drift: no batches processed yet")
        by_group: dict[str, dict[int, int]] = {}
        for r in merged.collect():  # groups x bins rows — KB probe
            by_group.setdefault(r["group"], {})[int(r["bin"])] = int(r["cnt"])
        if len(by_group) > self.max_groups:
            raise ValueError(
                f"IncrementalBinnedKS: {len(by_group)} groups exceeds "
                f"max_groups={self.max_groups} — groups are sources/"
                "snapshots, not entities."
            )
        totals = {g: sum(c.values()) for g, c in by_group.items()}
        groups = sorted(by_group)
        out = []
        for i, ga in enumerate(groups):
            for gb in groups[i + 1 :]:
                ca, cb = by_group[ga], by_group[gb]
                na, nb = totals[ga], totals[gb]
                cum_a = cum_b = 0
                d = 0.0
                for b in range(self.bins):
                    cum_a += ca.get(b, 0)
                    cum_b += cb.get(b, 0)
                    d = max(d, abs(cum_a / na - cum_b / nb))
                out.append((ga, gb, na, nb, round(d, self.round_to)))
        return self.spark.createDataFrame(
            out,
            "group_a string, group_b string, n_a bigint, n_b bigint, "
            "ks_stat double",
        )

    def attach(self) -> "callable":
        """``foreachBatch`` adapter."""

        def _fn(df: DataFrame, batch_id: int) -> None:
            self.process_batch(df)

        return _fn
