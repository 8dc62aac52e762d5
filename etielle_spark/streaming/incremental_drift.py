"""Incremental drift monitors for a continuously-ingested corpus:
vocabulary JS divergence, Population Stability Index, and a binned
Kolmogorov-Smirnov statistic maintained across micro-batches — the
monitors a production ingest runs continuously instead of re-scanning
history per check.

All follow the repo's bounded-register streaming pattern
(streaming/incremental_sketch.py): per batch, ONE bounded aggregation
summarizes the new rows into (group, bucket/bin, cnt) count registers
(at most groups x buckets rows — KILOBYTES regardless of batch size);
no read-modify-write, no state-store compaction.  Counts are ADDITIVE,
so sum-merging the stored registers at read time gives EXACTLY the
distribution a batch pass over the concatenated input would build — the
drift scores are therefore bit-identical to their batch twins
(``operators/text.py:vocab_drift``, ``operators/profile.py:psi_drift``),
which the differential tests assert as equality.

Unlike a bitmap-OR (incremental_dedup's bloom) or a max-merge register
(HLL), duplicated COUNT rows change the result — so replay safety can't
come from merge idempotence.  Each batch therefore writes its registers
to a DETERMINISTIC ``batch=<id>`` partition directory with
``mode("overwrite")``: ``foreachBatch`` redelivers a crashed micro-batch
under the same batch_id with the same data (Spark's replay contract),
and the overwrite replaces the partial/duplicate attempt instead of
appending beside it.  Calls without a batch_id (manual batch loops) get
a unique directory — plain append semantics, replay detection impossible
by construction there.

Replay safety must also survive DRIVER restarts: the register key is
(run_token, batch_id), and a token minted fresh per monitor instance
would store a restarted query's replayed batch beside the crashed
attempt's registers — counted twice.  ``attach()`` therefore refuses
the per-instance uuid default and requires a restart-stable token: a
caller-supplied ``run_id`` or a ``checkpoint_location`` (the token is
derived from the path, which IS the restart identity).

PSI's / binned-KS's bin edges are pinned at state creation from the
reference (edge) group — persisted in an ``_edges`` manifest beside the
registers, validated on reload.  The streaming contract is "score every
batch against the frozen baseline", which is what model monitoring means
by these scores; a new baseline is a new state dir.

Reference has no streaming analog; this extends the batch drift family
to the ingest path the way incremental_dedup.py does for LSH dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.profile import psi_bin_counts, psi_edges, psi_from_counts
from ..operators.text import js_from_counts, vocab_bucket_counts


def _path_missing(e: Exception) -> bool:
    """True only for path-not-found analysis errors — corruption,
    permission, and layout failures must SURFACE, never read as
    'no state yet'."""
    s = str(e)
    return (
        "PATH_NOT_FOUND" in s
        or "Path does not exist" in s
        # an existing dir with no data files (e.g. only the _edges
        # manifest after a crash between manifest and register writes)
        # fails schema inference — that is also "no state yet"
        or "UNABLE_TO_INFER_SCHEMA" in s
    )


def _check_geometry(
    spark: SparkSession,
    meta_dir: str,
    owner: str,
    state_dir: str,
    fields: dict,
    *,
    on_missing: str = "write",
) -> None:
    """Validate (writing on first contact) a sketch-geometry manifest:
    state written under one geometry merged/probed under another is
    silent garbage (mis-bucketed registers, mismatched band digests), so
    a mismatch RAISES — a new geometry is a new index/baseline.

    All I/O is driver-side (streaming/manifest.py) — the manifest is one
    JSON row, and paying a Spark job per touch was the round-8
    ``streaming_incremental_dedup`` regression.  ``on_missing="raise"``
    turns the first-contact write into an error, for indexes whose
    manifest doubles as a build-complete marker (PersistentIVFIndex)."""
    from .manifest import read_json_rows, write_json_rows

    rows = read_json_rows(spark, meta_dir)
    want = {k: int(v) for k, v in fields.items()}
    if rows:
        # a manifest written before a geometry field existed reads that
        # field as 0 — the "feature off" value by convention — so old
        # state opens under the old geometry and mismatches loudly
        # against any instance that turns the new feature on
        got = {k: int(rows[0].get(k, 0)) for k in fields}
        if got != want:
            raise ValueError(
                f"{owner}: state at {state_dir} was built with {got}, not "
                f"{want} — a new geometry is a new index/baseline; use a "
                "fresh dir."
            )
    elif on_missing == "raise":
        raise ValueError(
            f"{owner}: no geometry manifest at {meta_dir} — the index at "
            f"{state_dir} was never built, or a build crashed before its "
            "commit marker; (re)run build() (a fresh dir if the old one "
            "holds partial state)."
        )
    else:
        write_json_rows(spark, meta_dir, [want])


def _write_registers(
    counts: DataFrame, state_dir: str, run_token: str, batch_id
) -> None:
    """Write one batch's count registers.  (run_token, batch_id)-keyed
    directories make ``foreachBatch`` replays idempotent (same key ->
    same path -> overwrite) WITHOUT letting a different query whose
    batch ids restart at 0 clobber accumulated state — the run token
    scopes the key the way idempotent sinks scope on (queryId, batchId).
    id-less calls write a unique directory (plain append semantics)."""
    import uuid

    key = (
        f"{run_token}-b{int(batch_id)}"
        if batch_id is not None
        else "u" + uuid.uuid4().hex
    )
    counts.write.mode("overwrite").parquet(
        state_dir.rstrip("/") + f"/batch={key}"
    )


def _merged_counts(
    spark: SparkSession, state_dir: str, key_col, group_cols=("group",)
) -> DataFrame | None:
    """Sum-merge the LIVE register set (None if no state): batch dirs
    not folded into a compaction epoch, plus manifest-referenced epoch
    data (streaming/compaction.py) — O(1) consolidated files +
    O(recent) batch dirs after a ``compact()``.  The underscore
    manifests (``_edges``, ``_epochs``, ``_epoch_data``) stay hidden
    from the raw listing as always.  ``key_col`` may be a single name
    or a list (the CMS monitor merges (j, b) cells); ``group_cols``
    defaults to the drift monitors' single ``group``."""
    from .compaction import live_register_files

    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    cols = list(group_cols) + keys
    files = live_register_files(spark, state_dir)
    if not files:
        return None
    df = spark.read.parquet(*files).select(*cols, "cnt")
    return df.groupBy(*cols).agg(F.sum("cnt").alias("cnt"))


def _read_edges_manifest(
    spark: SparkSession, edges_dir: str, bins: int, owner: str, state_dir: str
) -> list[float] | None:
    """The frozen-edge manifest, or None when it has never been written.
    A manifest that is MISSING while register state exists is corruption
    (re-freezing edges would silently mix registers binned under
    different grids), so that case raises instead of re-freezing.
    Driver-side read (streaming/manifest.py) — this runs once per
    ``process_batch``, so a Spark job here would be a per-batch tax."""
    from .manifest import read_json_rows

    rows = read_json_rows(spark, edges_dir)
    if not rows:
        if _merged_counts(spark, state_dir, "bin") is not None:
            raise ValueError(
                f"{owner}: register state exists at {state_dir} but the "
                "_edges manifest is missing/empty — re-freezing edges would "
                "mix registers binned under different grids. Restore the "
                "manifest or start a fresh state dir."
            )
        return None
    r = rows[0]
    if int(r["bins"]) != bins:
        raise ValueError(
            f"{owner}: state at {state_dir} was built with "
            f"bins={int(r['bins'])}, not {bins} — a new binning is a new "
            "baseline; use a fresh state dir."
        )
    return [float(e) for e in r["edges"]]


def _checkpoint_token(checkpoint_location: str) -> str:
    """Deterministic run token from a checkpoint path: the checkpoint IS
    the restart identity (a restarted query resumes from the same
    location with the same batch ids), so keying registers on it makes
    (run_token, batch_id) stable across driver restarts.

    The location is lightly canonicalized first — ``file:///data/ckpt``,
    ``file:/data/ckpt`` and ``/data/ckpt`` name the same checkpoint and
    must yield the same token, or a restart script that spells the path
    differently re-enables the double-count this token prevents.
    (Relative paths can't be resolved against a cluster filesystem here;
    spell the location absolutely, as Structured Streaming itself
    expects.)"""
    import hashlib
    import posixpath
    from urllib.parse import urlparse

    u = urlparse(checkpoint_location)
    scheme = u.scheme or "file"
    path = posixpath.normpath((u.netloc or "") + u.path) if u.path else u.netloc
    canon = f"{scheme}://{path}"
    return "ckpt" + hashlib.md5(canon.encode()).hexdigest()[:12]


def _attach_token(monitor, checkpoint_location: str | None) -> str:
    """Resolve the register-scoping token for ``attach()``.  A fresh
    per-instance uuid is NOT acceptable here: a restarted checkpointed
    query replays its last uncommitted batch through a NEW monitor
    instance, and a new uuid would store the replay beside the crashed
    attempt's registers — double-counting the batch.  The token must
    therefore come from something that survives restarts: an explicit
    ``run_id`` or the query's checkpoint location.

    An explicit ``run_id`` WINS over ``checkpoint_location``: manual
    ``process_batch`` calls store under ``run_token``, so a monitor
    driven both ways on the same state dir must resolve to that same
    token — deriving a second token from the checkpoint path here would
    store the same batch_id twice, the exact double-count this contract
    exists to prevent."""
    if monitor._explicit_run_id:
        return monitor.run_token
    if checkpoint_location is not None:
        return _checkpoint_token(checkpoint_location)
    raise ValueError(
        f"{type(monitor).__name__}.attach: pass checkpoint_location= (the "
        "same checkpointLocation as the writeStream) or construct the "
        "monitor with an explicit run_id tied to your checkpoint. The "
        "default per-instance token is not restart-safe: a crashed query's "
        "replayed batch would be stored under a new token and counted "
        "twice."
    )


def _collect_by_group(
    merged: DataFrame,
    key_col: str,
    max_groups: int,
    per_group_rows: int,
    owner: str,
) -> dict[str, dict[int, int]]:
    """Driver-collect the merged groups x buckets table in ONE bounded
    action: each group contributes at most ``per_group_rows`` rows, so
    fetching the contract-size row count + 1 both proves a guard
    violation and caps driver memory on the way to the error (the same
    limit(cap+1) pattern as the batch operators)."""
    cap = max_groups * per_group_rows
    rows = merged.limit(cap + 1).collect()
    by_group: dict[str, dict[int, int]] = {}
    for r in rows:  # groups x buckets rows — KB probe
        by_group.setdefault(r["group"], {})[int(r[key_col])] = int(r["cnt"])
    if len(rows) > cap or len(by_group) > max_groups:
        raise ValueError(
            f"{owner}: more than max_groups={max_groups} distinct groups "
            "— groups are sources/snapshots, not entities."
        )
    return by_group


class IncrementalVocabDrift:
    """(group, bucket, cnt) unigram registers under ``state_dir``;
    ``drift()`` scores the merged state with the exact batch
    ``vocab_drift`` math."""

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
        run_id: str | None = None,
    ) -> None:
        import uuid

        self.spark = spark
        self.state_dir = state_dir
        self.text_col = text_col
        self.group_col = group_col
        self.n_buckets = int(n_buckets)
        self.k = k
        self.round_to = round_to
        self.max_groups = max_groups
        # scopes the (batch_id)-keyed register paths: pass a stable
        # run_id tied to your streaming checkpoint so replay idempotence
        # survives MONITOR restarts; distinct queries sharing a state
        # dir must use distinct run_ids.  The per-instance uuid default
        # is fine for manual process_batch loops (in-process retries
        # still dedup) but NOT restart-safe, so attach() refuses it
        # unless given a checkpoint_location to derive a stable token.
        self._explicit_run_id = run_id is not None
        self.run_token = run_id or uuid.uuid4().hex[:12]

    def process_batch(self, df: DataFrame, batch_id=None, *, _token=None) -> None:
        """Fold one batch in: one tokenize+hash pass to at most
        groups x n_buckets count rows.  Pass the ``foreachBatch``
        batch_id for replay-idempotent storage."""
        _write_registers(
            vocab_bucket_counts(
                df, self.text_col, self.group_col, n_buckets=self.n_buckets
            ),
            self.state_dir,
            _token or self.run_token,
            batch_id,
        )

    def counts(self) -> DataFrame | None:
        """Merged (group, bucket, cnt) — the distribution a batch pass
        over every processed row would build, exactly."""
        return _merged_counts(self.spark, self.state_dir, "bucket")

    def compact(self, *, keep_recent: int = 4) -> bool:
        """Fold batch dirs older than ``keep_recent`` (per run token)
        into one consolidated epoch — the additive register merge makes
        the fold lossless.  Call every N batches from the foreachBatch
        callback (single writer).  See streaming/compaction.py."""
        from .compaction import compact_registers, sum_counts

        return compact_registers(
            self.spark, self.state_dir, sum_counts, keep_recent=keep_recent
        )

    def drift(self) -> DataFrame:
        """Pairwise JS divergence over the merged state — bit-identical
        to ``vocab_drift`` over the concatenated batches."""
        merged = self.counts()
        if merged is None:
            raise ValueError(
                "IncrementalVocabDrift.drift: no batches processed yet"
            )
        by_group = _collect_by_group(
            merged, "bucket", self.max_groups, self.n_buckets,
            "IncrementalVocabDrift",
        )
        return js_from_counts(
            self.spark,
            by_group,
            n_buckets=self.n_buckets,
            k=self.k,
            round_to=self.round_to,
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
        with an explicit ``run_id``; otherwise this raises.
        ``compact_every=N`` folds old batch dirs into a consolidated
        epoch every N batches from inside the callback (the single
        writer), keeping the state dir at O(1) epochs + O(recent) batch
        dirs on a long-running stream."""
        token = _attach_token(self, checkpoint_location)

        def _fn(df: DataFrame, batch_id: int) -> None:
            self.process_batch(df, batch_id=batch_id, _token=token)
            if compact_every and batch_id % compact_every == compact_every - 1:
                self.compact()

        return _fn


class _BinnedValueMonitor:
    """Shared machinery of the frozen-edge value monitors (PSI and
    binned KS): NULL filtering, first-batch edge freezing with a
    persisted+validated ``_edges`` manifest, replay-idempotent register
    storage, and sum-merged reads."""

    _owner = "_BinnedValueMonitor"

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        *,
        value_col: str,
        group_col: str,
        baseline_group: str,
        bins: int,
        round_to: int,
        max_groups: int,
        run_id: str | None = None,
    ) -> None:
        import uuid

        if bins < 2:
            raise ValueError(f"{self._owner}: bins must be >= 2, got {bins}")
        self._explicit_run_id = run_id is not None
        self.run_token = run_id or uuid.uuid4().hex[:12]
        self.spark = spark
        self.state_dir = state_dir
        self.value_col = value_col
        self.group_col = group_col
        self.baseline_group = baseline_group
        self.bins = int(bins)
        self.round_to = round_to
        self.max_groups = max_groups
        self._edges_dir = state_dir.rstrip("/") + "/_edges"

    def _load_edges(self) -> list[float] | None:
        return _read_edges_manifest(
            self.spark, self._edges_dir, self.bins, self._owner, self.state_dir
        )

    def _src(self, df: DataFrame) -> DataFrame:
        return df.filter(
            F.col(self.group_col).isNotNull() & F.col(self.value_col).isNotNull()
        ).select(
            F.col(self.group_col).cast("string").alias("__g"),
            F.col(self.value_col).cast("double").alias("__v"),
        )

    def process_batch(self, df: DataFrame, batch_id=None, *, _token=None) -> None:
        """Fold one batch in.  The FIRST batch must contain the baseline
        group — its exact quantiles freeze the bin edges for the
        lifetime of the state (persisted + validated on reload).  Pass
        the ``foreachBatch`` batch_id for replay-idempotent storage."""
        src = self._src(df)
        edges = self._load_edges()
        if edges is None:
            # an EMPTY first micro-batch (common at stream start) is a
            # no-op, not an error — raising would wedge a checkpointed
            # query on permanent replay of batch 0
            if src.isEmpty():
                return
            edges = psi_edges(
                src.filter(F.col("__g") == self.baseline_group),
                "__v",
                bins=self.bins,
            )
            if edges is None:
                raise ValueError(
                    f"{self._owner}: first non-empty batch has no rows for "
                    f"baseline group {self.baseline_group!r} — the baseline "
                    "must arrive before scoring starts"
                )
            from .manifest import write_json_rows

            write_json_rows(
                self.spark,
                self._edges_dir,
                [{"bins": self.bins, "edges": [float(e) for e in edges]}],
            )
        _write_registers(
            psi_bin_counts(src, "__v", "__g", edges, bins=self.bins),
            self.state_dir,
            _token or self.run_token,
            batch_id,
        )

    def counts(self) -> DataFrame | None:
        return _merged_counts(self.spark, self.state_dir, "bin")

    def compact(self, *, keep_recent: int = 4) -> bool:
        """Fold old batch dirs into one consolidated epoch (lossless —
        additive counts); see streaming/compaction.py."""
        from .compaction import compact_registers, sum_counts

        return compact_registers(
            self.spark, self.state_dir, sum_counts, keep_recent=keep_recent
        )

    def _by_group(self, what: str) -> dict[str, dict[int, int]]:
        merged = self.counts()
        if merged is None:
            raise ValueError(f"{self._owner}.{what}: no batches processed yet")
        return _collect_by_group(
            merged, "bin", self.max_groups, self.bins, self._owner
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
        with an explicit ``run_id``; otherwise this raises.
        ``compact_every=N`` folds old batch dirs into a consolidated
        epoch every N batches (see IncrementalVocabDrift.attach)."""
        token = _attach_token(self, checkpoint_location)

        def _fn(df: DataFrame, batch_id: int) -> None:
            self.process_batch(df, batch_id=batch_id, _token=token)
            if compact_every and batch_id % compact_every == compact_every - 1:
                self.compact()

        return _fn


class IncrementalPSI(_BinnedValueMonitor):
    """(group, bin, cnt) registers with FROZEN reference-quantile bin
    edges; ``psi()`` scores the merged state with the exact batch
    ``psi_drift`` math."""

    _owner = "IncrementalPSI"

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
        run_id: str | None = None,
    ) -> None:
        super().__init__(
            spark,
            state_dir,
            value_col=value_col,
            group_col=group_col,
            baseline_group=ref_group,
            bins=bins,
            round_to=round_to,
            max_groups=max_groups,
            run_id=run_id,
        )
        self.ref_group = ref_group
        self.k = k

    def psi(self) -> DataFrame:
        """PSI of every group vs the frozen reference — bit-identical to
        ``psi_drift`` over the concatenated batches (the reference group
        fully present in batch one pins identical edges)."""
        by_group = self._by_group("psi")
        return psi_from_counts(
            self.spark,
            by_group,
            self.ref_group,
            bins=self.bins,
            k=self.k,
            round_to=self.round_to,
        )


class IncrementalBinnedKS(_BinnedValueMonitor):
    """Streaming Kolmogorov-Smirnov over FROZEN quantile bins: the
    third monitor of the family — max CDF gap (tail-shape sensitive)
    beside PSI (mass-weighted) and vocab JS (content).

    Exactness contract: the score equals batch
    ``operators.profile.ks_drift`` applied to the BIN-CENSORED values
    (each value replaced by its bin index) — i.e. the empirical CDFs are
    evaluated at the ``bins`` frozen edges instead of at every distinct
    value.  With quantile edges from the baseline slice, the bin grid is
    exactly where the CDF mass sits, so the binned D converges to the
    exact D at 1/bins resolution (and always lower-bounds it); the trade
    is O(groups x bins) state regardless of how many rows or distinct
    values ever flow through — the property a continuous-feature stream
    needs."""

    _owner = "IncrementalBinnedKS"

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
        run_id: str | None = None,
    ) -> None:
        super().__init__(
            spark,
            state_dir,
            value_col=value_col,
            group_col=group_col,
            baseline_group=edge_group,
            bins=bins,
            round_to=round_to,
            max_groups=max_groups,
            run_id=run_id,
        )
        self.edge_group = edge_group

    def drift(self) -> DataFrame:
        """Pairwise binned-KS statistic ``(group_a, group_b, n_a, n_b,
        ks_stat)``, lexically ordered pairs — the groups x bins merged
        state is a KB driver probe, so the pairwise max-gap scan runs
        driver-side like the batch twins' score stages."""
        by_group = self._by_group("drift")
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
