"""Stdlib-only image codecs + perceptual hashing primitives.

The environment has no PIL/pyav, so round 2 stubbed every decode.  This
module closes that seam with a real, dependency-free codec path:

- PNG decode: chunk walk, zlib inflate, per-scanline unfilter (filter
  types 0-4 incl. Paeth), 8-bit depth, color types 0 (gray), 2 (RGB),
  3 (palette), 4 (gray+alpha), 6 (RGBA).  Interlace and non-8-bit
  depths are rejected with a clear error.
- PNG encode (for fixtures/round-trips): filter 0, zlib.
- BMP decode/encode: uncompressed BI_RGB 24/32-bit, bottom-up rows.
- Grayscale (ITU-R BT.601 integer luma), box resize, orthonormal 2-D
  DCT-II (numpy matmul — a 32x32 DCT is two 32x32 GEMMs).
- ``ahash_bytes`` (average hash) and ``phash_bytes`` (DCT sign hash),
  both 60-bit so the value stays positive in any signed-64 engine
  (keeps results oracle-checkable; see operators/multimodal.py).

Everything here runs inside Arrow-batched ``mapInPandas`` workers —
pure Python + numpy per batch, no JVM round-trips.  Images in training
pipelines are small relative to batches, so the per-image Python cost
amortizes; the distributed shape (partition-at-a-time, binary columns)
is what matters at 100 TB.

No reference equivalent (the reference has no media path); this is the
repo's own multimodal extension.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (before palette expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes):
    """Decode a PNG → ``(width, height, mode, pixels)`` with mode one of
    ``L``/``LA``/``RGB``/``RGBA`` and ``pixels`` a flat ``bytes`` of
    8-bit samples in raster order (palette images expand to RGB)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # skip CRC
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    nch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG data length mismatch")

    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        # recurrent filters accumulate in int32 (uint8 scalar adds are
        # correct mod 256 but emit RuntimeWarning on overflow, which
        # breaks warnings-as-errors environments), then mask back down
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            acc = line.astype(np.int32)
            for i in range(nch, stride):
                acc[i] = (acc[i] + acc[i - nch]) & 0xFF
            cur = acc.astype(np.uint8)
        elif ftype == 2:  # Up
            cur = ((line.astype(np.int32) + prev) & 0xFF).astype(np.uint8)
        elif ftype == 3:  # Average
            acc = line.astype(np.int32)
            for i in range(stride):
                left = int(acc[i - nch]) if i >= nch else 0
                acc[i] = (acc[i] + ((left + int(prev[i])) >> 1)) & 0xFF
            cur = acc.astype(np.uint8)
        elif ftype == 4:  # Paeth
            acc = line.astype(np.int32)
            for i in range(stride):
                left = int(acc[i - nch]) if i >= nch else 0
                up_left = int(prev[i - nch]) if i >= nch else 0
                acc[i] = (acc[i] + _paeth(left, int(prev[i]), up_left)) & 0xFF
            cur = acc.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = cur

    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
        rgb = pal[out.reshape(height, width)]
        return width, height, "RGB", rgb.tobytes()
    mode = {0: "L", 2: "RGB", 4: "LA", 6: "RGBA"}[color_type]
    return width, height, mode, out.tobytes()


def encode_png(width: int, height: int, pixels: bytes, mode: str = "L") -> bytes:
    """Encode 8-bit samples (raster order, flat) as a PNG (filter 0)."""
    color_type = {"L": 0, "LA": 4, "RGB": 2, "RGBA": 6}[mode]
    nch = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}[mode]
    stride = width * nch
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer size mismatch")
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw.extend(pixels[y * stride : (y + 1) * stride])

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_bmp(data: bytes):
    """Decode an uncompressed BI_RGB 24/32-bit BMP → (w, h, 'RGB', pixels)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError("BMP core header not supported")
    width, height = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    flip = height > 0
    height = abs(height)
    nch = bpp // 8
    row_bytes = (width * nch + 3) & ~3
    out = np.empty((height, width, 3), dtype=np.uint8)
    for y in range(height):
        row = np.frombuffer(
            data, dtype=np.uint8, count=width * nch, offset=pix_off + y * row_bytes
        ).reshape(width, nch)
        dst = height - 1 - y if flip else y
        out[dst, :, 0] = row[:, 2]  # BGR -> RGB
        out[dst, :, 1] = row[:, 1]
        out[dst, :, 2] = row[:, 0]
    return width, height, "RGB", out.tobytes()


def encode_bmp(width: int, height: int, rgb_pixels: bytes) -> bytes:
    """Encode RGB raster bytes as a bottom-up 24-bit BI_RGB BMP."""
    if len(rgb_pixels) != width * height * 3:
        raise ValueError("pixel buffer size mismatch")
    row_bytes = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_bytes - width * 3)
    body = bytearray()
    arr = np.frombuffer(rgb_pixels, dtype=np.uint8).reshape(height, width, 3)
    for y in range(height - 1, -1, -1):
        bgr = arr[y][:, ::-1]
        body.extend(bgr.tobytes())
        body.extend(pad)
    data_off = 14 + 40
    file_size = data_off + len(body)
    hdr = b"BM" + struct.pack("<IHHI", file_size, 0, 0, data_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return hdr + dib + bytes(body)


def decode_image(data: bytes):
    """Sniff PNG/BMP by magic bytes and decode."""
    if data[:8] == PNG_SIG:
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    raise ValueError("unrecognized image format (PNG/BMP supported)")


def to_grayscale(mode: str, width: int, height: int, pixels: bytes) -> np.ndarray:
    """8-bit luma plane (ITU-R BT.601 integer weights) as (h, w) uint8."""
    nch = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}[mode]
    a = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, nch)
    if mode in ("L", "LA"):
        return a[:, :, 0].copy()
    r = a[:, :, 0].astype(np.uint32)
    g = a[:, :, 1].astype(np.uint32)
    b = a[:, :, 2].astype(np.uint32)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


def box_resize(gray: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Box-average resize to (th, tw), float64.  Exact mean when the
    source dims are integer multiples of the target (the fixture path);
    otherwise pixel-bucket means (np.add.reduceat)."""
    h, w = gray.shape
    if h % th == 0 and w % tw == 0:
        return gray.reshape(th, h // th, tw, w // tw).mean(axis=(1, 3))
    ys = (np.arange(th + 1) * h) // th
    xs = (np.arange(tw + 1) * w) // tw
    csum = np.zeros((h + 1, w + 1))
    csum[1:, 1:] = gray.astype(np.float64).cumsum(0).cumsum(1)
    out = np.empty((th, tw))
    for i in range(th):
        for j in range(tw):
            y0, y1, x0, x1 = ys[i], ys[i + 1], xs[j], xs[j + 1]
            area = (y1 - y0) * (x1 - x0)
            out[i, j] = (
                csum[y1, x1] - csum[y0, x1] - csum[y1, x0] + csum[y0, x0]
            ) / area
    return out


def _dct_matrix(n: int) -> np.ndarray:
    x = np.arange(n)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / (2 * n))
    m *= np.sqrt(2.0 / n)
    m[0] *= np.sqrt(0.5)
    return m


_DCT32 = _dct_matrix(32)


def dct2(block: np.ndarray) -> np.ndarray:
    """Orthonormal 2-D DCT-II of a 32x32 block (two GEMMs)."""
    return _DCT32 @ block @ _DCT32.T


def idct2(coefs: np.ndarray) -> np.ndarray:
    return _DCT32.T @ coefs @ _DCT32


# raster order over the top-left 8x8 DCT block, excluding DC; the first
# 60 entries are the hash bits (60 < 63 keeps the int positive in
# signed-64 engines, matching the md5-prefix convention in q175)
PHASH_COEF_ORDER = [(u, v) for u in range(8) for v in range(8) if (u, v) != (0, 0)][:60]


def phash_bytes(data: bytes, *, bits: int = 60) -> int:
    """DCT sign hash: decode → luma → box-resize 32x32 → DCT → sign of
    the first ``bits`` low-frequency AC coefficients (raster order).

    Sign thresholding (vs classic pHash's median) is scale-robust the
    same way — the DC term carries all the brightness offset — and makes
    the hash an exact linear functional of the image, so a synthetic
    image built as an inverse DCT provably round-trips its own bits
    (the oracle path in benchqueries q202-q204).
    """
    w, h, mode, px = decode_image(data)
    gray = to_grayscale(mode, w, h, px)
    small = box_resize(gray, 32, 32)
    coefs = dct2(small)
    out = 0
    for i, (u, v) in enumerate(PHASH_COEF_ORDER[:bits]):
        out |= (1 if coefs[u, v] > 0 else 0) << (bits - 1 - i)
    return out


def ahash_bytes(data: bytes, *, bits: int = 60) -> int:
    """Average hash: decode → luma → box-resize 8x8 → bit per cell
    (mean > 127), raster order, first ``bits`` cells."""
    w, h, mode, px = decode_image(data)
    gray = to_grayscale(mode, w, h, px)
    small = box_resize(gray, 8, 8)
    flat = small.reshape(-1)[:bits]
    out = 0
    for i, v in enumerate(flat):
        out |= (1 if v > 127 else 0) << (bits - 1 - i)
    return out


def render_bits_blocks(bits60: int, *, block: int = 4, bits: int = 60) -> bytes:
    """Synthesize a 32x32 grayscale PNG whose 4x4 blocks are white/black
    per bit (raster order, MSB first; cells beyond ``bits`` are black).
    ``ahash_bytes`` of the result recovers ``bits60`` exactly — box
    averaging over constant blocks is exact and PNG is lossless."""
    cells = np.zeros(64, dtype=np.uint8)
    for i in range(bits):
        if (bits60 >> (bits - 1 - i)) & 1:
            cells[i] = 255
    img = np.kron(cells.reshape(8, 8), np.ones((block, block), dtype=np.uint8))
    return encode_png(8 * block, 8 * block, img.tobytes(), "L")


def render_bits_dct(bits60: int, *, amplitude: float = 30.0, bits: int = 60) -> bytes:
    """Synthesize a 32x32 grayscale PNG as 128 + inverse-DCT of ±amplitude
    coefficients placed per bit of ``bits60`` (PHASH_COEF_ORDER).

    ``phash_bytes`` of the result recovers ``bits60`` exactly: the DCT is
    linear and orthonormal, pixel rounding perturbs each coefficient by
    ≪ amplitude, and amplitude is small enough that no pixel clips
    (60 coeffs × 30 / 16 ≈ 112 < 127 worst-case deviation).
    """
    coefs = np.zeros((32, 32))
    for i, (u, v) in enumerate(PHASH_COEF_ORDER[:bits]):
        sign = 1.0 if (bits60 >> (bits - 1 - i)) & 1 else -1.0
        coefs[u, v] = sign * amplitude
    img = idct2(coefs) + 128.0
    img = np.clip(np.rint(img), 0, 255).astype(np.uint8)
    return encode_png(32, 32, img.tobytes(), "L")
