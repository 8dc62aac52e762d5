"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The convention (SURVEY-level design, no reference equivalent): a modality
column is ``binary`` payload plus a ``struct`` metadata column
(mime/width/height/duration/...).  Decode and feature extraction run as
Arrow-batched ``mapInPandas`` operators so the heavy Python (PIL/ffmpeg/...)
touches each partition's rows exactly once, in batches.

The actual codec libraries are NOT available in this environment, so the
decode step is stubbed: ``decode_stub=True`` produces deterministic fake
features (so the Spark-side plumbing — schema, batching, partitioning —
is real and testable), while ``decode_stub=False`` raises
NotImplementedError where the codec call would go.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str, *, mime: str = "application/octet-stream") -> DataFrame:
    """Build a (payload binary, media_meta struct) pair from a source column.

    In production the payload comes from the lake (parquet binary / object
    store); here it is synthesized so the downstream plumbing is exercised
    with real bytes.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(mime).alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("bigint").alias("duration_ms"),
    )
    return df.withColumn("payload", payload).withColumn("media_meta", meta)


FEATURE_SCHEMA = "id bigint, byte_len bigint, digest string, feat array<double>"


def extract_features(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    *,
    feat_dim: int = 8,
    decode_stub: bool = True,
) -> DataFrame:
    """Per-payload feature extraction via Arrow-batched ``mapInPandas``.

    The batch shape is the part that matters at scale: one Python worker
    per partition, Arrow record batches in/out, no per-row serde.  The
    deterministic stub derives ``feat`` from the payload digest; swap the
    stub branch for a real decoder (PIL / torchaudio / pyav) when the
    codec libraries are present.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires codec libraries not present "
                    "in this environment; run with decode_stub=True"
                )
            payloads = pdf[payload_col]
            digests = payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            feats = digests.map(
                lambda h: [int(h[2 * i : 2 * i + 2], 16) / 255.0 for i in range(feat_dim)]
            )
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "byte_len": payloads.map(len),
                    "digest": digests,
                    "feat": feats,
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(op, FEATURE_SCHEMA)


def resize_images(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    *,
    width: int = 224,
    height: int = 224,
    decode_stub: bool = True,
) -> DataFrame:
    """Image resize as an Arrow-batched operator.

    Real plumbing (schema, batching, partition-at-a-time Python), stubbed
    codec: the deterministic fake emits the target dimensions and a
    digest-derived 'thumbnail' payload.  Swap the stub branch for
    PIL.Image.resize when codecs are present.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "image decode requires PIL; run with decode_stub=True"
                )
            digests = pdf[payload_col].map(lambda b: hashlib.md5(bytes(b)).digest())
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "width": width,
                    "height": height,
                    "resized": digests.map(lambda d: d * (width * height // 16 + 1))
                    .map(lambda b: b[: width * height // 8]),
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        op, f"id bigint, width int, height int, resized binary"
    )


def sample_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    *,
    n_frames: int = 4,
    decode_stub: bool = True,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (mapInPandas fan-out — the batch-in, multi-row-out shape).

    The stub derives per-frame digests deterministically; a real
    implementation seeks n uniformly-spaced keyframes via pyav.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "video decode requires pyav; run with decode_stub=True"
                )
            rows = {"id": [], "frame_idx": [], "frame_digest": []}
            for _, r in pdf.iterrows():
                base = hashlib.md5(bytes(r[payload_col])).hexdigest()
                for i in range(n_frames):
                    rows["id"].append(r[id_col])
                    rows["frame_idx"].append(i)
                    rows["frame_digest"].append(
                        hashlib.md5(f"{base}|{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        op, "id bigint, frame_idx int, frame_digest string"
    )


def perceptual_hash(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    *,
    decode_stub: bool = True,
) -> DataFrame:
    """60-bit perceptual hash per payload via Arrow-batched mapInPandas.

    Real implementation: grayscale-decode, downscale to 32x32, 2D DCT,
    threshold the top-left 8x8 coefficients against their median (the
    classic pHash).  The codec is stubbed here like the rest of this
    module: the deterministic fake derives 60 bits from the payload md5
    (identical payloads get identical hashes, so downstream Hamming
    plumbing is exercised for real).  60 bits keeps the value positive
    in any signed-64 engine, which keeps the result oracle-checkable.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "image decode requires PIL/scipy; run with decode_stub=True"
                )
            hashes = pdf[payload_col].map(
                lambda b: int(hashlib.md5(bytes(b)).hexdigest()[:15], 16)
            )
            yield pd.DataFrame({"id": pdf[id_col], "phash": hashes})

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        op, "id bigint, phash bigint"
    )


def hamming_near_dup(
    hashes: DataFrame,
    id_col: str = "id",
    hash_col: str = "phash",
    *,
    bits: int = 60,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs under Hamming distance over fixed-width
    hashes (pHash image dedup, SimHash text dedup) — banded equi-join,
    never all-pairs.

    Pigeonhole: two hashes within Hamming distance ``max_hamming`` <
    ``bands`` differ in at most ``max_hamming`` of the ``bands`` disjoint
    bit segments, so at least one segment matches EXACTLY — candidate
    generation is an equi-join on (band index, segment value), then the
    exact Hamming verify (``bit_count(xor)``) runs only on candidates.
    All pure column expressions; the shuffle key is a (int, int) pair.

    Returns ``(id_a, id_b, hamming)`` with ``id_a < id_b``.
    """
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs at least {max_hamming + 1} "
            f"bands for the pigeonhole guarantee (got bands={bands})"
        )
    if bits % bands:
        raise ValueError(f"bits={bits} not divisible by bands={bands}")
    seg = bits // bands
    mask = (1 << seg) - 1
    h = hashes.select(F.col(id_col).alias("id"), F.col(hash_col).alias("h"))
    banded = h.select(
        "id",
        "h",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("h"), b * seg).bitwiseAND(mask)
                    for b in range(bands)
                ]
            )
        ).alias("band", "bv"),
    )
    cand = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.h").alias("ha"),
            F.col("r.h").alias("hb"),
        )
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
