"""Minimal uncompressed-AVI (RIFF / BI_RGB 24-bit DIB) codec — stdlib
only, the video twin of the PNG/BMP/WAV codecs in ``imagecodec.py``.

Scope (enough for the fixture-driven real-decode pipeline, mirroring the
reference-free precedent of the other codecs): single 'vids' stream,
BITMAPINFOHEADER with biCompression=0 (BI_RGB), bottom-up 24-bit BGR
frames in '00db' chunks inside the 'movi' list.  No index (idx1) is
required to read; one is written for player compatibility.

Container layout written/parsed::

    RIFF <sz> 'AVI '
      LIST <sz> 'hdrl'
        'avih' <56>          main header (us/frame, totalframes, w, h)
        LIST <sz> 'strl'
          'strh' <56>        stream header (fccType='vids', 'DIB ')
          'strf' <40>        BITMAPINFOHEADER (BI_RGB, 24bpp)
      LIST <sz> 'movi'
        '00db' <sz> <frame>  bottom-up BGR rows, 4-byte padded
        ...
      'idx1' <sz>            frame index (written, not needed to read)
"""

from __future__ import annotations

import struct

import numpy as np


def _rows_bgr_bottom_up(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB raster -> bottom-up BGR with 4-byte row padding."""
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    bgr = a[::-1, :, ::-1]
    stride = width * 3
    pad = (-stride) % 4
    if pad:
        bgr = np.concatenate(
            [bgr.reshape(height, stride),
             np.zeros((height, pad), dtype=np.uint8)],
            axis=1,
        )
    return bgr.tobytes()


def _rows_rgb_top_down(width: int, height: int, dib: bytes) -> bytes:
    stride = width * 3
    pad = (-stride) % 4
    full = stride + pad
    a = np.frombuffer(dib, dtype=np.uint8, count=full * height).reshape(
        height, full
    )[:, :stride].reshape(height, width, 3)
    return a[::-1, :, ::-1].tobytes()


def encode_avi(
    width: int, height: int, frames_rgb: list[bytes], *, fps: int = 10
) -> bytes:
    """Encode top-down RGB24 frames as an uncompressed AVI."""
    if not frames_rgb:
        raise ValueError("encode_avi: need at least one frame")
    if any(len(f) != width * height * 3 for f in frames_rgb):
        raise ValueError("encode_avi: frame size mismatch")
    dibs = [_rows_bgr_bottom_up(width, height, f) for f in frames_rgb]
    frame_sz = len(dibs[0])
    n = len(dibs)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,        # dwMicroSecPerFrame
        frame_sz * fps,          # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        n,                       # dwTotalFrames
        0,                       # dwInitialFrames
        1,                       # dwStreams
        frame_sz,                # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,              # dwReserved
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIII4H",
            0, 0, 0,             # flags, priority, language
            0,                   # initial frames
            1, fps,              # scale, rate -> fps
            0, n,                # start, length (frames)
            frame_sz,            # suggested buffer
            0xFFFFFFFF,          # quality (default)
            0,                   # sample size (varies)
            0, 0, 0, 0,          # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, frame_sz, 0, 0, 0, 0,
    )

    def chunk(fcc: bytes, body: bytes) -> bytes:
        return fcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", len(body) + 4) + kind + body

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_body = b"".join(chunk(b"00db", d) for d in dibs)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame (fcc, flags=KEYFRAME, offset, size)
    off = 4  # offsets are relative to the start of 'movi' data
    idx_entries = []
    for d in dibs:
        idx_entries.append(
            b"00db" + struct.pack("<III", 0x10, off, len(d))
        )
        off += 8 + len(d) + (len(d) % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(data: bytes):
    """Parse an uncompressed AVI; returns ``(width, height, frames)``
    with each frame top-down RGB24 bytes."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    width = height = None
    bpp = compression = None
    frames: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal width, height, bpp, compression
        while pos + 8 <= end:
            fcc = buf[pos : pos + 4]
            (sz,) = struct.unpack_from("<I", buf, pos + 4)
            body_at = pos + 8
            if fcc == b"LIST":
                walk(buf, body_at + 4, body_at + sz)
            elif fcc == b"avih":
                vals = struct.unpack_from("<14I", buf, body_at)
                width, height = vals[8], vals[9]
            elif fcc == b"strf":
                hdr = struct.unpack_from("<IiiHHI", buf, body_at)
                bpp, compression = hdr[4], hdr[5]
            elif fcc[2:4] in (b"db", b"dc") and fcc[:2].isdigit():
                frames.append(buf[body_at : body_at + sz])
            pos = body_at + sz + (sz % 2)

    walk(data, 12, 8 + struct.unpack_from("<I", data, 4)[0])
    if width is None or height is None:
        raise ValueError("AVI missing avih header")
    if compression not in (0, None):
        raise ValueError(f"unsupported AVI compression {compression}")
    if bpp not in (24, None):
        raise ValueError(f"unsupported AVI bit depth {bpp} (only 24)")
    return width, height, [
        _rows_rgb_top_down(width, height, d) for d in frames
    ]
