"""State compaction for the incremental monitors.

Every incremental monitor keeps its history as bounded-size register
writes — but ONE write per micro-batch, forever.  Data volume is bounded
(each write is KB); file/directory COUNT is not: a 30-second-trigger
stream runs ~2.9M batches/year, and the merge-at-read path
(``heavy_hitters()``, ``drift()``, ``estimate()``) pays O(batches) in
LISTING cost long before it pays anything in data.  Compaction bounds
the read path at O(1) consolidated dirs + O(recent) batch dirs.

Two shapes, matching the two state algebras:

**Manifest-keyed epoch compaction** (count registers: the drift
monitors' ``(group, bin, cnt)``, the CMS ``(groups, j, b, cnt)`` and its
candidate sets).  Counts are additive but NOT idempotent — a register
row read twice is a double-count — so compaction must never let a batch
dir and the epoch that folded it both be readable.  The protocol:

1. merge the foldable sources (previous epoch dirs + batch dirs older
   than ``keep_recent``) with the state's own algebra (sum / distinct)
   and write the result under ``<state>/_epoch_data/e<k>`` — an
   UNDERSCORE path, invisible to any parquet listing until referenced;
2. commit one append-only manifest ``<state>/_epochs/e<k>`` naming the
   epoch's data dir and every source dir it folded;
3. delete the folded source dirs (pure garbage collection — step 2
   already removed them from the read set).

The read path derives the live set from the manifests: referenced epoch
dirs plus batch dirs NOT named as folded.  Every crash window is closed
by construction: epoch data without a manifest is never read; a
manifest without the deletions just means folded dirs linger as ignored
garbage (removed by the next compaction); a ``foreachBatch`` replay
that re-creates a folded ``batch=`` dir writes the same rows the epoch
already holds and stays ignored — which is exactly the replay-idempotent
outcome.  ``keep_recent`` must exceed the stream's replay horizon
(foreachBatch replays only the last uncommitted batch, so >= 2 is safe;
the default is conservative).  Single writer: the monitor that owns the
state dir — call ``compact()`` from the foreachBatch callback every N
batches, or between runs.

**Flat idempotent compaction** (HLL max-registers, the dedup digest
index, Bloom bitmap words).  These merges are idempotent (max /
anti-join probe / bitwise OR), so duplicated rows change nothing:
compaction just rewrites many small files as one and deletes the
originals, and the crash window where old and new files coexist is
EXACT, not merely safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .incremental_drift import _path_missing

EPOCH_DATA = "_epoch_data"
EPOCH_MANIFESTS = "_epochs"


def _hadoop_delete(spark: SparkSession, path_str: str, recursive: bool) -> None:
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    fs.delete(p, recursive)


def _parquet_files(spark: SparkSession, path: str) -> list[str]:
    """All parquet data files under ``path`` (recursive, hidden paths
    excluded by Hadoop's listing), [] when the path has never been
    written.  Non-missing errors surface — a transient storage failure
    must never read as 'no state'."""
    try:
        return list(
            spark.read.option("recursiveFileLookup", "true")
            .parquet(path)
            .inputFiles()
        )
    except Exception as e:
        if _path_missing(e):
            return []
        raise


def _read_manifests(spark: SparkSession, state_dir: str):
    """(live_epoch_rels, folded_rels, next_epoch_id).  Epoch data dirs
    that a LATER epoch folded are in folded_rels like any batch dir.
    Driver-side read (streaming/manifest.py) — this runs on EVERY
    merged-state read via ``live_register_files``, so a Spark job here
    would tax every ``drift()``/``estimate()``/``heavy_hitters()``."""
    from .manifest import read_json_rows

    mdir = state_dir.rstrip("/") + "/" + EPOCH_MANIFESTS
    rows = read_json_rows(spark, mdir, recursive=True)
    if rows is None:
        return [], set(), 0
    folded: set[str] = set()
    by_epoch: dict[int, str] = {}
    for r in rows:
        by_epoch[int(r["epoch"])] = r["data"]
        for d in r["folded"]:
            folded.add(d)
    live = [rel for k, rel in sorted(by_epoch.items()) if rel not in folded]
    nxt = max(by_epoch) + 1 if by_epoch else 0
    return live, folded, nxt


def _batch_dirs(files: list[str]) -> dict[str, list[str]]:
    """Group register files by their ``batch=<key>`` parent dir name."""
    by_dir: dict[str, list[str]] = {}
    for f in files:
        parts = f.rstrip("/").split("/")
        if len(parts) >= 2 and parts[-2].startswith("batch="):
            by_dir.setdefault(parts[-2], []).append(f)
    return by_dir


def live_register_files(spark: SparkSession, state_dir: str) -> list[str]:
    """The readable register set: manifest-referenced epoch data plus
    batch dirs not folded into any epoch.  This is the ONE place the
    epoch protocol touches the read path."""
    base = state_dir.rstrip("/")
    live_epochs, folded, _ = _read_manifests(spark, state_dir)
    files = [
        f
        for f in _parquet_files(spark, state_dir)
        if _batch_rel(f) not in folded
    ]
    for rel in live_epochs:
        files.extend(_parquet_files(spark, f"{base}/{rel}"))
    return files


def _batch_rel(f: str) -> str | None:
    parts = f.rstrip("/").split("/")
    if len(parts) >= 2 and parts[-2].startswith("batch="):
        return parts[-2]
    return None


def _recent_keep(batch_names: list[str], keep_recent: int) -> set[str]:
    """The batch dirs that must survive: the ``keep_recent`` highest
    batch ids per run token.  Token-less ``batch=u<uuid>`` dirs (manual
    loops, plain append semantics — replay detection impossible there by
    construction) are never replayed, so they are always foldable."""
    by_token: dict[str, list[tuple[int, str]]] = {}
    for name in batch_names:
        key = name[len("batch=") :]
        tok, sep, bid = key.rpartition("-b")
        if sep and bid.isdigit():
            by_token.setdefault(tok, []).append((int(bid), name))
    keep: set[str] = set()
    for tok, pairs in by_token.items():
        pairs.sort()
        keep.update(name for _, name in pairs[-keep_recent:])
    return keep


def sum_counts(df: DataFrame) -> DataFrame:
    """The additive-count algebra: identical to the read-time merge, so
    folding then merging equals merging everything at once."""
    keys = [c for c in df.columns if c != "cnt"]
    return df.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def distinct_rows(df: DataFrame) -> DataFrame:
    """The set algebra (candidate sets): union + distinct."""
    return df.distinct()


def compact_registers(
    spark: SparkSession,
    state_dir: str,
    merge,
    *,
    keep_recent: int = 4,
    min_fold: int = 4,
) -> bool:
    """Fold old batch dirs (and any previous epochs) into one new epoch.
    Returns True when a fold happened.  ``merge`` is the state's own
    read-time algebra (``sum_counts`` / ``distinct_rows``); ``min_fold``
    skips pointless single-source folds."""
    base = state_dir.rstrip("/")
    live_epochs, folded, next_epoch = _read_manifests(spark, state_dir)

    all_files = _parquet_files(spark, state_dir)
    by_dir = _batch_dirs(all_files)
    # garbage from a crashed deletion or a replayed-after-fold batch:
    # already out of the read set, remove the dirs now
    for name in sorted(set(by_dir) & folded):
        _hadoop_delete(spark, f"{base}/{name}", True)
        del by_dir[name]

    keep = _recent_keep(sorted(by_dir), keep_recent)
    fold_batches = sorted(set(by_dir) - keep)
    sources = list(live_epochs) + fold_batches
    if len(sources) < min_fold:
        return False

    src_files = [f for name in fold_batches for f in by_dir[name]]
    for rel in live_epochs:
        src_files.extend(_parquet_files(spark, f"{base}/{rel}"))
    if not src_files:
        return False

    data_rel = f"{EPOCH_DATA}/e{next_epoch:06d}"
    merged = merge(spark.read.parquet(*src_files))
    merged.coalesce(1).write.mode("overwrite").parquet(f"{base}/{data_rel}")

    # the commit point: one append-only manifest (its own dir per epoch,
    # never rewritten) flips the folded sources out of the read set and
    # the epoch data in, atomically from the reader's perspective
    from .manifest import write_json_rows

    write_json_rows(
        spark,
        f"{base}/{EPOCH_MANIFESTS}/e{next_epoch:06d}",
        [{"epoch": next_epoch, "data": data_rel, "folded": sources}],
    )

    for rel in sources:
        _hadoop_delete(spark, f"{base}/{rel}", True)
    return True


def compact_flat_parquet(
    spark: SparkSession,
    path: str,
    *,
    merge=None,
    min_files: int = 8,
    target_files: int = 1,
) -> list[str]:
    """Rewrite an idempotent-merge parquet dir (HLL registers, dedup
    digests, bloom words) as ``target_files`` files.  Writes the
    consolidated files FIRST, then deletes the originals — the crash
    window where both exist is exact because the merge is idempotent.
    Returns the new file list ([] when below ``min_files``)."""
    files = _parquet_files(spark, path)
    if len(files) < min_files:
        return []
    df = spark.read.parquet(*files)
    if merge is not None:
        df = merge(df)
    df.coalesce(target_files).write.mode("append").parquet(path)
    for f in files:
        _hadoop_delete(spark, f, False)
    return sorted(set(_parquet_files(spark, path)))
