"""Driver-side JSON manifest I/O for the incremental monitors' tiny
(KB-scale) state manifests — geometry pins, frozen bin edges, bloom
coverage lists, IVF codebooks, compaction epoch manifests.

These were originally read/written with ``spark.read.json`` /
``createDataFrame().coalesce(1).write.json``, each a full Spark job —
scheduler round-trip, task launch, commit protocol — a multi-second
fixed cost per touch for one row of JSON (measured as the entire
``streaming_incremental_dedup`` 8.2 -> 13.6 s round-8 bench
regression: first contact with a fresh index paid a read-miss job plus
a write job).  A one-row manifest needs a *filesystem* read, not a
distributed job, so everything here goes through the Hadoop
``FileSystem`` API directly — which resolves the same way Spark's own
data paths do (local, HDFS, S3A, ABFS, ...), runs entirely on the
driver, and launches no job.

Layout contract (back-compatible with the Spark-written dirs): a
manifest at ``<path>`` is a DIRECTORY holding JSON-lines files.  This
module writes VERSIONED files ``data-<n>.json`` (hidden tmp file +
same-directory rename INTO the next version, superseded files deleted
only AFTER the rename) so every crash point leaves a readable
manifest: before the rename the previous version is untouched; after
it, both versions exist and the reader takes the numerically greatest.
There is no window where the manifest reads as missing.  Directories
with no versioned file keep the legacy behavior — EVERY non-hidden
file is read — so old ``part-*.json`` Spark-written manifests and old
``data.json`` dirs keep reading, and ``spark.read.json(path)`` still
reads the new layout (external tooling and a few tests do).

Object-store caveat: the two-state guarantee rides on an atomic
same-directory rename (local FS, HDFS, ABFS).  On stores where rename
is copy+delete (S3A without a committer), a reader racing the copy can
observe a partially-written greatest version — there, corruption
surfaces as the documented ``ValueError``, never as silent "no state".

Error discipline (the ``_path_missing`` contract): a MISSING path reads
as ``None`` ("never written"); unparseable content RAISES — a torn or
corrupt manifest is corruption and must surface, never silently read as
"no state yet" (for the geometry manifests that silent read would
rewrite the pin and wave mismatched state through).
"""

from __future__ import annotations

import json
import re

from pyspark.sql import SparkSession

# versioned manifest files written by write_json_rows (zero-padded so
# lexical order == numeric order for anyone eyeballing the directory)
_VERSIONED = re.compile(r"^data-(\d+)\.json$")


def _fs_for(spark: SparkSession, path_str: str):
    """(jvm, Path, FileSystem) for a path string, resolved through the
    session's Hadoop configuration — the same resolution Spark's own
    readers use, so the manifests live wherever the state parquet does."""
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return jvm, p, fs


def _read_text(jvm, fs, path) -> str:
    """Whole-file read through the Hadoop stream API (manifests are KB
    by contract, so a line loop over the py4j bridge is fine)."""
    stream = fs.open(path)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        lines = []
        while True:
            line = reader.readLine()
            if line is None:
                break
            lines.append(line)
        return "\n".join(lines)
    finally:
        stream.close()


def _data_files(fs, status, out: list, recursive: bool) -> None:
    """Collect non-hidden data files under a status.  Hidden children
    (``_SUCCESS``, ``.data.json.tmp`` leftovers, dot files) are skipped
    at every level — the Hadoop listing convention — but the ROOT path
    itself may be underscore-named (``_meta``, ``_edges``, ...)."""
    if status.isDirectory():
        for child in fs.listStatus(status.getPath()):
            name = child.getPath().getName()
            if name.startswith("_") or name.startswith("."):
                continue
            if child.isDirectory():
                if recursive:
                    _data_files(fs, child, out, recursive)
            else:
                out.append(child.getPath())
    else:
        out.append(status.getPath())


def _pick_versions(files: list) -> list:
    """Within each directory, if versioned ``data-<n>.json`` files exist,
    keep ONLY the numerically greatest one — lower versions (and any
    legacy ``data.json`` / ``part-*``) in that directory are superseded
    content a crash between rename and cleanup left behind.  Directories
    with no versioned file pass through untouched (legacy layout)."""
    by_dir: dict[str, tuple[int, object]] = {}
    for fp in files:
        m = _VERSIONED.match(fp.getName())
        if m:
            parent = str(fp.getParent())
            v = int(m.group(1))
            if parent not in by_dir or v > by_dir[parent][0]:
                by_dir[parent] = (v, fp)
    if not by_dir:
        return files
    out = []
    for fp in files:
        parent = str(fp.getParent())
        if parent in by_dir:
            if str(fp) == str(by_dir[parent][1]):
                out.append(fp)
        else:
            out.append(fp)
    return out


def read_json_rows(
    spark: SparkSession, path: str, *, recursive: bool = False
) -> list[dict] | None:
    """Parse every JSON line under ``path`` (driver-side, no Spark job).
    Returns ``None`` when the path has never been written (missing, or
    holds no data file / no line); raises ``ValueError`` on unparseable
    content — a torn manifest must surface, never read as 'no state'."""
    jvm, p, fs = _fs_for(spark, path)
    # Bounded retry: a reader can list version N, then race the single
    # writer's post-rename cleanup (which deletes N after N+1 lands) and
    # find the listed file gone.  Re-listing picks up N+1 — the
    # previous-or-new contract, just one listing later.  Three strikes
    # means the path is being deleted outright; surface that.
    last_exc: Exception | None = None
    for _ in range(3):
        if not fs.exists(p):
            return None
        files: list = []
        _data_files(fs, fs.getFileStatus(p), files, recursive)
        files = _pick_versions(files)
        rows: list[dict] = []
        try:
            for fp in sorted(files, key=str):
                for line in _read_text(jvm, fs, fp).splitlines():
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        rows.append(json.loads(line))
                    except ValueError as e:
                        raise ValueError(
                            f"corrupt JSON manifest file {fp} under {path}: "
                            f"{e} — restore the manifest or start a fresh "
                            "state dir"
                        ) from e
        except ValueError:
            raise
        except Exception as e:  # py4j FileNotFoundException et al.
            if "FileNotFoundException" not in str(e):
                raise
            last_exc = e
            continue
        return rows or None
    raise IOError(
        f"manifest at {path} kept vanishing mid-read (3 attempts) — "
        "is something deleting the state dir?"
    ) from last_exc


def write_json_rows(spark: SparkSession, path: str, rows: list[dict]) -> None:
    """Write ``rows`` as the manifest at ``path`` (driver-side, no Spark
    job): hidden tmp -> rename into the NEXT ``data-<n>.json`` version,
    then delete superseded content (lower versions, legacy ``data.json``,
    old Spark-written ``part-*`` sets).  Because the delete happens only
    AFTER the rename, a crash or concurrent reader at any point observes
    either the previous manifest or the new one — never a torn file, and
    never a falsely-missing one (the round-9 layout deleted before
    renaming, so a crash in between read as "never written")."""
    jvm, p, fs = _fs_for(spark, path)
    base = path.rstrip("/")
    data = "".join(json.dumps(r, sort_keys=True) + "\n" for r in rows)
    tmp = jvm.org.apache.hadoop.fs.Path(base + "/.data.json.tmp")
    out = fs.create(tmp, True)  # creates parent dirs
    try:
        out.write(bytearray(data.encode("utf-8")))
    finally:
        out.close()
    version = 0
    for st in fs.listStatus(p):
        m = _VERSIONED.match(st.getPath().getName())
        if m:
            version = max(version, int(m.group(1)))
    target = jvm.org.apache.hadoop.fs.Path(base + f"/data-{version + 1:010d}.json")
    if not fs.rename(tmp, target):
        raise IOError(f"manifest rename failed: {tmp} -> {target}")
    # now drop superseded content; hidden names (_SUCCESS, tmp leftovers)
    # are never in the read set and are left alone
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith(".") or name == target.getName():
            continue
        fs.delete(st.getPath(), True)
