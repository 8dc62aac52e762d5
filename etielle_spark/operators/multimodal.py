"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The convention (SURVEY-level design, no reference equivalent): a modality
column is ``binary`` payload plus a ``struct`` metadata column
(mime/width/height/duration/...).  Decode and feature extraction run as
Arrow-batched ``mapInPandas`` operators so the heavy Python (PIL/ffmpeg/...)
touches each partition's rows exactly once, in batches.

Image decode is REAL: ``decode_stub=False`` routes through the
stdlib-only PNG/BMP codec in ``operators/imagecodec.py`` (zlib inflate,
scanline unfilter, luma, box resize, DCT) — no PIL required.  Video
decode is REAL too: ``sample_frames(decode_stub=False)`` parses
uncompressed AVI through ``operators/avicodec.py`` (RIFF walk, DIB
frame decode, per-frame luma).  ``decode_stub=True`` keeps the round-2
digest-derived fakes for plumbing-only tests.

NULL payloads are skipped (filtered before the Arrow batch) on every
payload-consuming operator — one NULL blob must not kill a 100 TB job,
and a codec has nothing defined to emit for it.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from ..session import ship_package

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
        if not decode_stub:
            from . import imagecodec as ic

            def real_feat(b: bytes) -> list[float]:
                w, h, mode, px = ic.decode_image(bytes(b))
                gray = ic.to_grayscale(mode, w, h, px)
                cells = ic.box_resize(gray, 8, 8).reshape(-1) / 255.0
                head = [float(w), float(h), float(gray.mean()), float(gray.std())]
                return (head + cells.tolist())[:feat_dim]

        for pdf in batches:
            payloads = pdf[payload_col]
            digests = payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            if decode_stub:
                feats = digests.map(
                    lambda h: [
                        int(h[2 * i : 2 * i + 2], 16) / 255.0 for i in range(feat_dim)
                    ]
                )
            else:
                feats = payloads.map(real_feat)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "byte_len": payloads.map(len),
                    "digest": digests,
                    "feat": feats,
                }
            )

    ship_package(df)
    return df.select(F.col(id_col), F.col(payload_col)).filter(F.col(payload_col).isNotNull()).mapInPandas(op, FEATURE_SCHEMA)


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

    ``decode_stub=False`` is the REAL path: PNG/BMP decode → luma →
    box resize → PNG re-encode (operators/imagecodec.py, stdlib-only).
    ``decode_stub=True`` keeps the digest-derived fake thumbnail for
    plumbing-only tests.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not decode_stub:
            import numpy as np

            from . import imagecodec as ic

            def real_resize(b: bytes) -> bytes:
                w, h, mode, px = ic.decode_image(bytes(b))
                gray = ic.to_grayscale(mode, w, h, px)
                small = ic.box_resize(gray, width, height)
                out = np.clip(np.rint(small), 0, 255).astype("uint8")
                return ic.encode_png(width, height, out.tobytes(), "L")

        for pdf in batches:
            if decode_stub:
                digests = pdf[payload_col].map(
                    lambda b: hashlib.md5(bytes(b)).digest()
                )
                resized = digests.map(
                    lambda d: (d * (width * height // 16 + 1))[: width * height // 8]
                )
            else:
                resized = pdf[payload_col].map(real_resize)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "width": width,
                    "height": height,
                    "resized": resized,
                }
            )

    ship_package(df)
    return df.select(F.col(id_col), F.col(payload_col)).filter(F.col(payload_col).isNotNull()).mapInPandas(
        op, f"id bigint, width int, height int, resized binary"
    )


def generate_videos(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_frames: int = 8,
    width: int = 16,
    height: int = 12,
    fps: int = 10,
) -> DataFrame:
    """Render one REAL uncompressed AVI per row, deterministically
    derived from md5(text) — the video twin of ``generate_images``:
    frame ``i`` is a constant-gray frame whose level is byte ``i`` of
    the md5 digest, so the decoded mean luminance of frame ``i`` equals
    ``('0x' || substr(md5(text), 2i+1, 2))::INT`` exactly (BT.601 integer
    luma of R=G=B=v is v, and the container is lossless) — an
    engine-independent value any SQL oracle can compute without a codec.

    Output: ``(id, payload binary, media_meta struct)``.
    """
    if not 1 <= n_frames <= 16:
        raise ValueError("n_frames must be in 1..16 (one md5 byte per frame)")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .avicodec import encode_avi

        px = width * height * 3

        def render(t: str) -> bytes:
            dig = hashlib.md5(t.encode()).digest()
            return encode_avi(
                width,
                height,
                [bytes([dig[i]]) * px for i in range(n_frames)],
                fps=fps,
            )

        for pdf in batches:
            yield pd.DataFrame(
                {"id": pdf[id_col], "payload": pdf[text_col].map(render)}
            )

    ship_package(df)
    rendered = df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        op, "id bigint, payload binary"
    )
    meta = F.struct(
        F.lit("video/x-msvideo").alias("mime"),
        F.lit(width).alias("width"),
        F.lit(height).alias("height"),
        F.lit(int(n_frames * 1000 / fps)).cast("bigint").alias("duration_ms"),
    )
    return rendered.withColumn("media_meta", meta)


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

    ``decode_stub=False`` is the REAL pipeline (``avicodec``, stdlib
    only): parse the RIFF container, decode ``n_frames`` uniformly
    spaced uncompressed DIB frames (stride ``total // n``, the whole
    clip when it has <= n frames), and emit each frame's decoded mean
    luminance — output ``(id, frame_idx, mean_luma)``.
    ``decode_stub=True`` keeps the md5-derived fake for plumbing-only
    tests — output ``(id, frame_idx, frame_digest)``.
    """

    if not decode_stub:

        def op_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import numpy as np

            from . import imagecodec as ic
            from .avicodec import decode_avi

            for pdf in batches:
                rows = {"id": [], "frame_idx": [], "mean_luma": []}
                for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                    w, h, frames = decode_avi(bytes(payload))
                    total = len(frames)
                    step = max(total // n_frames, 1)
                    for j in range(min(n_frames, total)):
                        idx = j * step
                        gray = ic.to_grayscale("RGB", w, h, frames[idx])
                        rows["id"].append(rid)
                        rows["frame_idx"].append(idx)
                        rows["mean_luma"].append(
                            float(np.mean(gray.astype(np.float64)))
                        )
                yield pd.DataFrame(rows)

        ship_package(df)
        return df.select(F.col(id_col), F.col(payload_col)).filter(F.col(payload_col).isNotNull()).mapInPandas(
            op_real, "id bigint, frame_idx int, mean_luma double"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"id": [], "frame_idx": [], "frame_digest": []}
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                base = hashlib.md5(bytes(payload)).hexdigest()
                for i in range(n_frames):
                    rows["id"].append(rid)
                    rows["frame_idx"].append(i)
                    rows["frame_digest"].append(
                        hashlib.md5(f"{base}|{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(rows)

    ship_package(df)
    return df.select(F.col(id_col), F.col(payload_col)).filter(F.col(payload_col).isNotNull()).mapInPandas(
        op, "id bigint, frame_idx int, frame_digest string"
    )


def perceptual_hash(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    *,
    decode_stub: bool = True,
    method: str = "phash",
) -> DataFrame:
    """60-bit perceptual hash per payload via Arrow-batched mapInPandas.

    ``decode_stub=False`` is the REAL pipeline (operators/imagecodec.py,
    stdlib-only): PNG/BMP decode → luma → box-resize 32x32 → orthonormal
    2-D DCT → sign of the 60 low-frequency AC coefficients
    (``method="phash"``), or 8x8 box-average thresholding
    (``method="ahash"``).  ``decode_stub=True`` keeps the round-2
    md5-derived fake for plumbing-only tests.  60 bits keeps the value
    positive in any signed-64 engine, which keeps the result
    oracle-checkable.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not decode_stub:
            from . import imagecodec as ic

            hash_fn = ic.phash_bytes if method == "phash" else ic.ahash_bytes
        for pdf in batches:
            if decode_stub:
                hashes = pdf[payload_col].map(
                    lambda b: int(hashlib.md5(bytes(b)).hexdigest()[:15], 16)
                )
            else:
                hashes = pdf[payload_col].map(lambda b: hash_fn(bytes(b)))
            yield pd.DataFrame({"id": pdf[id_col], "phash": hashes})

    ship_package(df)
    return df.select(F.col(id_col), F.col(payload_col)).filter(F.col(payload_col).isNotNull()).mapInPandas(
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


def generate_images(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    style: str = "dct",
    amplitude: float = 30.0,
) -> DataFrame:
    """Render one REAL 32x32 grayscale PNG per row, deterministically
    derived from md5(text) — the dependency-free image fixture path.

    ``style="dct"`` embeds the 60 md5-prefix bits as ±amplitude DCT
    coefficients (``imagecodec.render_bits_dct``), so the full real
    pipeline decode→luma→resize→DCT→sign (``perceptual_hash`` with
    ``decode_stub=False``) provably recovers
    ``int(md5(text)[:15], 16)`` — an engine-independent value any SQL
    oracle can compute.  ``style="blocks"`` does the same for the
    average-hash path (4x4 constant blocks).

    Output: ``(id, payload binary, media_meta struct)``.
    """
    if style not in ("dct", "blocks"):
        raise ValueError(f"unknown style {style!r}")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import imagecodec as ic

        render = (
            (lambda v: ic.render_bits_dct(v, amplitude=amplitude))
            if style == "dct"
            else ic.render_bits_blocks
        )

        for pdf in batches:
            payloads = pdf[text_col].map(
                lambda t: render(int(hashlib.md5(t.encode()).hexdigest()[:15], 16))
            )
            yield pd.DataFrame({"id": pdf[id_col], "payload": payloads})

    ship_package(df)
    rendered = df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        op, "id bigint, payload binary"
    )
    meta = F.struct(
        F.lit("image/png").alias("mime"),
        F.lit(32).alias("width"),
        F.lit(32).alias("height"),
        F.lit(None).cast("bigint").alias("duration_ms"),
    )
    return rendered.withColumn("media_meta", meta)


def generate_audio(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    sample_rate: int = 16000,
    amplitude: int = 16384,
) -> DataFrame:
    """Render one REAL mono 16-bit PCM WAV per row, deterministically
    derived from md5(text) — the audio twin of ``generate_images``
    (operators/audiocodec.py:render_bits_wav): 16 samples of ±amplitude
    per md5-prefix bit, so decoded features are closed-form functions
    of the bits any SQL oracle can compute.

    Output: ``(id, payload binary, media_meta struct)``.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import audiocodec as ac

        for pdf in batches:
            payloads = pdf[text_col].map(
                lambda t: ac.render_bits_wav(
                    int(hashlib.md5(t.encode()).hexdigest()[:15], 16),
                    amplitude=amplitude,
                    sample_rate=sample_rate,
                )
            )
            yield pd.DataFrame({"id": pdf[id_col], "payload": payloads})

    ship_package(df)
    rendered = df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        op, "id bigint, payload binary"
    )
    meta = F.struct(
        F.lit("audio/wav").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(int(60 * 16 / sample_rate * 1000)).cast("bigint").alias("duration_ms"),
    )
    return rendered.withColumn("media_meta", meta)


def extract_audio_features(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
) -> DataFrame:
    """REAL audio feature extraction via Arrow-batched ``mapInPandas``:
    PCM WAV decode (operators/audiocodec.py — stdlib-only, no stub) →
    sample-rate/duration/RMS/peak/zero-crossings over channel 0.

    Same batch shape as ``extract_features``: one Python worker per
    partition, Arrow record batches, no per-row serde.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import audiocodec as ac

        for pdf in batches:
            feats = pdf[payload_col].map(lambda b: ac.wav_features(bytes(b)))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "sample_rate": feats.map(lambda f: f["sample_rate"]),
                    "n_frames": feats.map(lambda f: f["n_frames"]),
                    "duration_ms": feats.map(lambda f: f["duration_ms"]),
                    "rms": feats.map(lambda f: f["rms"]),
                    "peak": feats.map(lambda f: f["peak"]),
                    "zero_crossings": feats.map(lambda f: f["zero_crossings"]),
                }
            )

    ship_package(df)
    return df.select(F.col(id_col), F.col(payload_col)).filter(F.col(payload_col).isNotNull()).mapInPandas(
        op,
        "id bigint, sample_rate int, n_frames bigint, duration_ms double, "
        "rms double, peak int, zero_crossings int",
    )
