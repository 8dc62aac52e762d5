"""WebDataset-style tar shard container for multimodal training export.

Training loaders for image/audio/text corpora stream samples from tar
shards where one sample is a group of same-key members — ``{key}.txt``,
``{key}.png``, … (the public WebDataset convention).  This module turns
a DataFrame with one row per sample into those shards and back, with
the layout fully determined by (seed, key):

- ``wds_write`` — deterministic shard assignment + intra-shard order
  from ``clusters.shard_assign``'s md5 hash, one tar per shard written
  executor-side (tar members get zeroed mtime/uid/gid, so re-running
  the same corpus + seed reproduces every shard byte-for-byte);
- ``wds_read`` — parallel tar scan back to one row per member;
- ``wds_samples`` — regroup members into one row per sample with an
  ``ext -> bytes`` map.

Scale shape: the write is ONE shuffle (repartition by shard) and a
streaming per-partition tar append — no sample ever lands on the
driver; shard count controls file size (aim ~100-1000 MB per tar at
100 TB).  ``out_dir`` must be a filesystem every executor can reach
(local in tests; a mounted distributed FS on a cluster — the same
contract as any file sink).  The read is embarrassingly parallel: one
task per tar.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .clusters import shard_assign
from ..session import ship_package

_MANIFEST_SCHEMA = "shard bigint, path string, n_samples bigint, n_bytes bigint"


def wds_write(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    payloads: dict[str, str],
    *,
    num_shards: int,
    seed: int = 0,
    prefix: str = "shard",
) -> DataFrame:
    """Write ``df`` as WebDataset-style tar shards under ``out_dir`` and
    return the shard manifest ``(shard, path, n_samples, n_bytes)``.

    ``payloads`` maps member extension -> source column, e.g.
    ``{"txt": "text", "png": "payload"}``; string columns are written
    as their UTF-8 bytes, binary columns verbatim, and NULL payloads
    skip that member (the sample keeps its other members).  Keys must
    be unique per row — tar member names are ``{key}.{ext}``.

    Layout is a pure function of (seed, key): shard and intra-shard
    position come from the same md5 hash ``shard_assign`` uses, and tar
    metadata is zeroed, so identical input + seed => identical bytes —
    the property that makes shard-level caching and resume safe.
    """
    if not payloads:
        raise ValueError("wds_write: payloads must name at least one column")
    if num_shards < 1:
        raise ValueError(f"wds_write: num_shards must be >= 1, got {num_shards}")
    exts = sorted(payloads)
    h = F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(key_col).cast("string")))
    prepped = (
        shard_assign(df, key_col, num_shards, seed=seed)
        .filter(F.col(key_col).isNotNull())
        .select(
            F.col("shard"),
            h.alias("__h"),
            F.col(key_col).cast("string").alias("__key"),
            *[
                F.col(payloads[ext]).cast("binary").alias(f"__p_{ext}")
                for ext in exts
            ],
        )
        .repartition(num_shards, F.col("shard"))
        .sortWithinPartitions("shard", "__h", "__key")
    )

    def write_tars(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import tarfile

        os.makedirs(out_dir, exist_ok=True)
        state: dict = {"shard": None, "tar": None, "n": 0, "path": None}
        manifests: list[tuple[int, str, int, int]] = []

        def close_current() -> None:
            if state["tar"] is not None:
                state["tar"].close()
                manifests.append(
                    (
                        int(state["shard"]),
                        state["path"],
                        state["n"],
                        os.path.getsize(state["path"]),
                    )
                )
                state["tar"] = None

        import io

        for pdf in batches:
            cols = [pdf["shard"].to_numpy(), pdf["__key"].to_numpy()] + [
                pdf[f"__p_{ext}"].to_numpy() for ext in exts
            ]
            for shard, key, *datas in zip(*cols):
                shard = int(shard)
                if shard != state["shard"] or state["tar"] is None:
                    close_current()
                    path = os.path.join(out_dir, f"{prefix}-{shard:05d}.tar")
                    state.update(
                        shard=shard,
                        # PAX (not USTAR): USTAR caps member names at
                        # 100 chars and raises mid-write on the long
                        # URL/digest-derived keys WebDataset corpora use,
                        # leaving a truncated shard. WebDataset readers
                        # handle PAX; with fixed mtime/uid the bytes stay
                        # deterministic.
                        tar=tarfile.open(path, "w", format=tarfile.PAX_FORMAT),
                        n=0,
                        path=path,
                    )
                for ext, data in zip(exts, datas):
                    if data is None:
                        continue
                    blob = bytes(data)
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(blob)
                    info.mtime = 0
                    info.mode = 0o644
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    state["tar"].addfile(info, io.BytesIO(blob))
                state["n"] += 1
        close_current()
        yield pd.DataFrame(
            manifests, columns=["shard", "path", "n_samples", "n_bytes"]
        )

    # The manifest is tiny (num_shards rows); materialize so the tars
    # are on disk when this function returns, like any other sink.
    ship_package(prepped)
    manifest = prepped.mapInPandas(write_tars, _MANIFEST_SCHEMA).persist()
    manifest.count()
    return manifest


def wds_read(
    spark: SparkSession,
    tars: str | list[str],
    *,
    exts: list[str] | None = None,
) -> DataFrame:
    """Read tar shards back to one row per member:
    ``(shard_path, key, ext, data binary)``.  ``tars`` is a directory
    (all ``*.tar`` inside) or an explicit path list; ``exts`` filters
    member extensions.  One task per tar — embarrassingly parallel."""
    if isinstance(tars, str):
        import glob as _glob

        paths = sorted(_glob.glob(os.path.join(tars, "*.tar")))
    else:
        paths = sorted(tars)
    if not paths:
        raise ValueError("wds_read: no tar files to read")
    want = set(exts) if exts is not None else None
    pdf = spark.createDataFrame([(p,) for p in paths], "shard_path string")

    def read_tars(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import tarfile

        for b in batches:
            for path in b["shard_path"]:
                rows = []
                with tarfile.open(path, "r") as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        key, dot, ext = m.name.rpartition(".")
                        if not dot:
                            key, ext = m.name, ""
                        if want is not None and ext not in want:
                            continue
                        rows.append((path, key, ext, tf.extractfile(m).read()))
                yield pd.DataFrame(
                    rows, columns=["shard_path", "key", "ext", "data"]
                )

    ship_package(pdf)
    return pdf.repartition(len(paths), "shard_path").mapInPandas(
        read_tars, "shard_path string, key string, ext string, data binary"
    )


def wds_samples(members: DataFrame) -> DataFrame:
    """Regroup ``wds_read`` output into one row per sample:
    ``(shard_path, key, parts map<string,binary>)`` with members keyed
    by extension.  One aggregation keyed on (shard, key)."""
    return (
        members.groupBy("shard_path", "key")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("ext", "data")))
            ).alias("parts")
        )
    )
