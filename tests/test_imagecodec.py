"""Round-3 de-stub: the stdlib-only image codec
(etielle_spark/operators/imagecodec.py) and the real multimodal decode
paths built on it.  The PNG decode test builds its bytes CHUNK BY CHUNK
(not via encode_png) with every filter type, so decoder and encoder are
verified independently."""

import hashlib
import struct
import zlib

import numpy as np
import pytest

from etielle_spark.operators import imagecodec as ic


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def test_png_decode_known_bytes_all_filters():
    """Hand-assembled 4x5 grayscale PNG using filter types 0,1,2,3,4 —
    expected pixels computed by hand from the PNG spec recurrences."""
    width, height = 4, 5
    # raw scanlines: (filter_type, filtered bytes)
    scanlines = [
        (0, [10, 20, 30, 40]),   # none: as-is
        (1, [5, 5, 5, 5]),       # sub: cumulative 5,10,15,20
        (2, [1, 2, 3, 4]),       # up: prev + delta = 6,12,18,24
        (3, [8, 10, 12, 14]),    # average
        (4, [1, 1, 1, 1]),       # paeth
    ]
    raw = bytearray()
    for ftype, vals in scanlines:
        raw.append(ftype)
        raw.extend(vals)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    png = (
        ic.PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    w, h, mode, px = ic.decode_png(png)
    assert (w, h, mode) == (4, 5, "L")
    got = np.frombuffer(px, dtype=np.uint8).reshape(5, 4)
    # hand-computed:
    # row0 none:    10 20 30 40
    # row1 sub:     5 10 15 20
    # row2 up:      6 12 18 24
    # row3 average: left=0,up=6 -> 8+3=11; (11+12)//2=11 -> 21;
    #               (21+18)//2=19 -> 31; (31+24)//2=27 -> 41
    # row4 paeth:   p=left+up-ul; px0: a=0,b=11,c=0 -> pred 11 -> 12
    #               px1: a=12,b=21,c=11 -> p=22, pa=10,pb=1,pc=11 -> 21 -> 22
    #               px2: a=22,b=31,c=21 -> p=32, pa=10,pb=1,pc=11 -> 31 -> 32
    #               px3: a=32,b=41,c=31 -> p=42, pa=10,pb=1,pc=11 -> 41 -> 42
    expect = np.array(
        [
            [10, 20, 30, 40],
            [5, 10, 15, 20],
            [6, 12, 18, 24],
            [11, 21, 31, 41],
            [12, 22, 32, 42],
        ],
        dtype=np.uint8,
    )
    assert (got == expect).all()


def test_png_palette_and_rgba_decode():
    # palette: 2x2, indices [[0,1],[1,0]], palette red/green
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0])
    raw = bytes([0, 0, 1, 0, 1, 0])
    png = (
        ic.PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    w, h, mode, px = ic.decode_png(png)
    assert (w, h, mode) == (2, 2, "RGB")
    assert px == bytes([255, 0, 0, 0, 255, 0, 0, 255, 0, 255, 0, 0])

    # RGBA roundtrip through our encoder (filter 0 path)
    rgba = bytes(range(2 * 2 * 4))
    w, h, mode, px = ic.decode_png(ic.encode_png(2, 2, rgba, "RGBA"))
    assert (mode, px) == ("RGBA", rgba)


def test_png_rejects_unsupported():
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    png16 = ic.PNG_SIG + _chunk(b"IHDR", ihdr16)
    with pytest.raises(ValueError, match="bit depth"):
        ic.decode_png(png16)
    ihdr_i = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)
    with pytest.raises(ValueError, match="interlaced"):
        ic.decode_png(ic.PNG_SIG + _chunk(b"IHDR", ihdr_i))
    with pytest.raises(ValueError, match="signature"):
        ic.decode_png(b"JFIF....")


def test_bmp_roundtrip_and_padding():
    # width 3 -> 9-byte rows padded to 12; verifies BGR swap + bottom-up
    px = bytes(range(3 * 2 * 3))
    data = ic.encode_bmp(3, 2, px)
    assert ic.decode_bmp(data) == (3, 2, "RGB", px)
    assert ic.decode_image(data)[2] == "RGB"


def test_dct_matches_direct_formula():
    """Cross-check the GEMM DCT against the direct O(n^4) definition."""
    rng = np.random.RandomState(3)
    block = rng.rand(32, 32) * 255
    got = ic.dct2(block)
    n = 32
    for u, v in [(0, 0), (0, 3), (5, 2), (7, 7)]:
        au = np.sqrt((1 if u == 0 else 2) / n)
        av = np.sqrt((1 if v == 0 else 2) / n)
        direct = 0.0
        for x in range(n):
            for y in range(n):
                direct += (
                    block[x, y]
                    * np.cos((2 * x + 1) * u * np.pi / (2 * n))
                    * np.cos((2 * y + 1) * v * np.pi / (2 * n))
                )
        direct *= au * av
        assert abs(got[u, v] - direct) < 1e-6


def test_box_resize_exact_and_fractional():
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    r = ic.box_resize(g, 4, 4)
    assert r[0, 0] == (0 + 1 + 8 + 9) / 4
    # fractional path: 5x5 -> 2x2 bucket means
    g5 = np.arange(25, dtype=np.uint8).reshape(5, 5)
    r2 = ic.box_resize(g5, 2, 2)
    assert r2[0, 0] == pytest.approx(np.mean([0, 1, 5, 6]))
    assert r2[1, 1] == pytest.approx(g5[2:, 2:].mean())


def test_hash_bit_recovery_and_gray_robustness():
    for t in ("alpha", "beta", "x" * 300):
        v = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        assert ic.phash_bytes(ic.render_bits_dct(v)) == v
        assert ic.ahash_bytes(ic.render_bits_blocks(v)) == v
    # phash sign hash is brightness-shift robust (DC absorbs offset)
    v = int(hashlib.md5(b"gamma").hexdigest()[:15], 16)
    png = ic.render_bits_dct(v, amplitude=25.0)
    w, h, mode, px = ic.decode_png(png)
    arr = np.frombuffer(px, dtype=np.uint8).astype(np.int32) + 40
    brighter = ic.encode_png(w, h, np.clip(arr, 0, 255).astype(np.uint8).tobytes(), "L")
    assert ic.phash_bytes(brighter) == v


def test_real_multimodal_operators(spark):
    """The Spark-side real paths: generate -> decode features, resize,
    phash — driven through mapInPandas on a live session."""
    from etielle_spark.operators.multimodal import (
        extract_features,
        generate_images,
        perceptual_hash,
        resize_images,
    )

    docs = spark.createDataFrame(
        [(1, "first doc"), (2, "second doc"), (3, "first doc")],
        ["doc_id", "text"],
    )
    imgs = generate_images(docs, "doc_id", "text", style="dct")
    rows = {r["id"]: bytes(r["payload"]) for r in imgs.collect()}
    assert rows[1][:8] == ic.PNG_SIG and rows[1] == rows[3] and rows[1] != rows[2]

    hashes = {
        r["id"]: r["phash"]
        for r in perceptual_hash(imgs, "id", decode_stub=False).collect()
    }
    for i, t in ((1, "first doc"), (2, "second doc")):
        assert hashes[i] == int(hashlib.md5(t.encode()).hexdigest()[:15], 16)

    feats = {
        r["id"]: r
        for r in extract_features(imgs, "id", feat_dim=4, decode_stub=False).collect()
    }
    assert feats[1]["feat"][0] == 32.0 and feats[1]["feat"][1] == 32.0

    resized = {
        r["id"]: r for r in resize_images(imgs, "id", width=8, height=8, decode_stub=False).collect()
    }
    w, h, mode, px = ic.decode_png(bytes(resized[2]["resized"]))
    assert (w, h, mode) == (8, 8, "L")
    # resizing the DCT render to 8x8 box means = decoded 32x32 box means
    w0, h0, m0, px0 = ic.decode_png(rows[2])
    expect = np.clip(
        np.rint(ic.box_resize(ic.to_grayscale(m0, w0, h0, px0), 8, 8)), 0, 255
    )
    assert (np.frombuffer(px, dtype=np.uint8).reshape(8, 8) == expect).all()


def test_wav_decode_known_bytes():
    """Hand-assembled WAV (independent of encode_wav): 4 frames stereo
    16-bit PCM at 22050 Hz, plus an 8-bit mono file."""
    import struct

    from etielle_spark.operators import audiocodec as ac

    frames = [(100, -100), (200, -200), (-32768, 32767), (0, 1)]
    raw = b"".join(struct.pack("<hh", a, b) for a, b in frames)
    fmt = struct.pack("<HHIIHH", 1, 2, 22050, 22050 * 4, 4, 16)
    body = b"WAVEfmt " + struct.pack("<I", 16) + fmt + b"data" + struct.pack("<I", len(raw)) + raw
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, ch, samples = ac.decode_wav(wav)
    assert (rate, ch) == (22050, 2)
    assert samples.tolist() == [list(f) for f in frames]

    raw8 = bytes([128, 255, 0, 128])  # recentred: 0, 127, -128, 0
    fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body8 = b"WAVEfmt " + struct.pack("<I", 16) + fmt8 + b"data" + struct.pack("<I", 4) + raw8
    rate, ch, s8 = ac.decode_wav(b"RIFF" + struct.pack("<I", len(body8)) + body8)
    assert s8[:, 0].tolist() == [0, 127, -128, 0]

    import pytest as _pt
    with _pt.raises(ValueError, match="RIFF"):
        ac.decode_wav(b"nope")


def test_wav_zero_crossing_zero_handling():
    """Zeros inherit the previous sign: +,0,- counts one crossing."""
    import numpy as np

    from etielle_spark.operators import audiocodec as ac

    wav = ac.encode_wav(8000, np.asarray([5, 0, -5, -5, 0, 0, 5], dtype="<i2"))
    f = ac.wav_features(wav)
    assert f["zero_crossings"] == 2


def test_audio_operators_on_session(spark):
    """generate_audio -> extract_audio_features over a live session."""
    import hashlib

    from etielle_spark.operators.multimodal import (
        extract_audio_features,
        generate_audio,
    )

    docs = spark.createDataFrame([(1, "hello"), (2, "world")], ["doc_id", "text"])
    feats = {
        r["id"]: r
        for r in extract_audio_features(
            generate_audio(docs, "doc_id", "text"), "id"
        ).collect()
    }
    for i, t in ((1, "hello"), (2, "world")):
        v = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        flips = bin((v ^ (v >> 1)) & ((1 << 59) - 1)).count("1")
        assert feats[i]["zero_crossings"] == flips
        assert feats[i]["rms"] == 16384.0 and feats[i]["duration_ms"] == 60.0


def test_avi_roundtrip_exact():
    """Uncompressed-AVI encode/decode is lossless, including non-4-byte
    row strides (padding path)."""
    import numpy as np

    from etielle_spark.operators.avicodec import decode_avi, encode_avi

    rng = np.random.RandomState(7)
    for w, h in ((16, 12), (5, 3), (7, 2)):
        frames = [
            rng.randint(0, 256, w * h * 3, dtype=np.uint8).tobytes()
            for _ in range(3)
        ]
        avi = encode_avi(w, h, frames)
        w2, h2, out = decode_avi(avi)
        assert (w2, h2) == (w, h)
        assert out == frames


def test_avi_rejects_garbage():
    import pytest as _pytest

    from etielle_spark.operators.avicodec import decode_avi

    with _pytest.raises(ValueError, match="RIFF"):
        decode_avi(b"not an avi at all")


def test_sample_frames_real_decode(spark):
    """generate_videos -> sample_frames(decode_stub=False): the decoded
    mean luma of sampled frame i is exactly md5-byte i of the text."""
    import hashlib

    from etielle_spark.operators.multimodal import (
        generate_videos,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "quick brown fox")], "doc_id long, text string"
    )
    vids = generate_videos(docs, "doc_id", "text", n_frames=8)
    out = sample_frames(vids, "id", n_frames=4, decode_stub=False)
    rows = {(r["id"], r["frame_idx"]): r["mean_luma"] for r in out.collect()}
    assert len(rows) == 8  # 2 docs x 4 sampled frames
    for doc_id, text in ((1, "hello world"), (2, "quick brown fox")):
        dig = hashlib.md5(text.encode()).digest()
        for j in range(4):
            idx = j * 2
            assert rows[(doc_id, idx)] == float(dig[idx])


def test_sample_frames_stub_schema_unchanged(spark):
    from etielle_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame([(1, bytearray(b"xyz"))], "id long, payload binary")
    out = sample_frames(df, "id", n_frames=2)
    assert out.columns == ["id", "frame_idx", "frame_digest"]
    assert out.count() == 2
