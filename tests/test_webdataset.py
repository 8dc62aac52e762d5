"""WebDataset-style tar shard container: deterministic byte-identical
shards, lossless roundtrip, NULL-payload member skipping, manifest
accounting, and sample regrouping."""

from __future__ import annotations

import hashlib
import os
import tarfile

from pyspark.sql import functions as F

from etielle_spark.operators.webdataset import wds_read, wds_samples, wds_write


def _docs(spark, n=40):
    from etielle_spark.operators.multimodal import generate_images

    base = spark.createDataFrame(
        [(i, f"document body {i}") for i in range(n)], "doc_id long, text string"
    )
    imgs = generate_images(base, "doc_id", "text").select(
        F.col("id").alias("doc_id"), "payload"
    )
    return base.join(imgs, "doc_id")


def test_wds_roundtrip_lossless(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "wds")
    manifest = wds_write(
        docs, out, "doc_id", {"txt": "text", "png": "payload"}, num_shards=4
    )
    man = manifest.collect()
    assert sum(r.n_samples for r in man) == 40
    assert all(os.path.getsize(r.path) == r.n_bytes for r in man)

    members = wds_read(spark, out)
    got = {
        (r.key, r.ext): bytes(r.data) for r in members.collect()
    }
    want = {}
    for r in docs.collect():
        want[(str(r.doc_id), "txt")] = r.text.encode()
        want[(str(r.doc_id), "png")] = bytes(r.payload)
    assert got == want

    samples = wds_samples(members).collect()
    assert len(samples) == 40
    assert all(set(s.parts) == {"txt", "png"} for s in samples)


def test_wds_write_is_byte_deterministic(spark, tmp_path):
    docs = _docs(spark, n=25)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for out in (a, b):
        wds_write(docs, out, "doc_id", {"txt": "text"}, num_shards=3, seed=7)

    def digests(d):
        return {
            f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(d))
        }

    da, db = digests(a), digests(b)
    assert da and da == db
    # different seed => different layout
    c = str(tmp_path / "c")
    wds_write(docs, c, "doc_id", {"txt": "text"}, num_shards=3, seed=8)
    assert digests(c) != da


def test_wds_null_payload_skips_member(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "one", b"\x01"), (2, None, b"\x02"), (3, "three", None)],
        "doc_id long, text string, payload binary",
    )
    out = str(tmp_path / "wds")
    wds_write(docs, out, "doc_id", {"txt": "text", "bin": "payload"}, num_shards=1)
    members = {(r.key, r.ext) for r in wds_read(spark, out).collect()}
    assert members == {("1", "txt"), ("1", "bin"), ("2", "bin"), ("3", "txt")}


def test_wds_tar_members_are_clean(spark, tmp_path):
    docs = _docs(spark, n=10)
    out = str(tmp_path / "wds")
    wds_write(docs, out, "doc_id", {"txt": "text"}, num_shards=1, prefix="p")
    path = os.path.join(out, "p-00000.tar")
    with tarfile.open(path) as tf:
        for m in tf:
            assert m.mtime == 0 and m.uid == 0 and m.gid == 0
            assert m.mode == 0o644


def test_wds_read_ext_filter_and_validation(spark, tmp_path):
    docs = _docs(spark, n=6)
    out = str(tmp_path / "wds")
    wds_write(docs, out, "doc_id", {"txt": "text", "png": "payload"}, num_shards=2)
    only_png = wds_read(spark, out, exts=["png"])
    assert {r.ext for r in only_png.collect()} == {"png"}
    import pytest

    with pytest.raises(ValueError):
        wds_read(spark, str(tmp_path / "missing"))
    with pytest.raises(ValueError):
        wds_write(docs, out, "doc_id", {}, num_shards=2)
