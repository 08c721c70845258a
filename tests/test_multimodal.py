"""Multimodal plumbing tests: binary payload features, byte-budget
repartitioning, frame-sample planning (engine/multimodal.py)."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from engine import multimodal


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, b"\x89PNG-fake-bytes" * 50, "image", (64, 48, None, None)),
        (2, b"RIFF-fake-audio" * 200, "audio", (None, None, 16000, 2500)),
        (3, b"\x00\x00ftyp-fake-video" * 999, "video", (1920, 1080, None, 4500)),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_deterministic_features(media_df):
    out = {r["media_id"]: r for r in multimodal.deterministic_features(media_df).collect()}
    raw = {1: b"\x89PNG-fake-bytes" * 50, 2: b"RIFF-fake-audio" * 200, 3: b"\x00\x00ftyp-fake-video" * 999}
    for mid, payload in raw.items():
        assert out[mid]["n_bytes"] == len(payload)
        assert out[mid]["sha"] == hashlib.sha256(payload).hexdigest()
        assert out[mid]["feature"] == payload[:8].hex()


def test_repartition_by_byte_budget(media_df):
    small = multimodal.repartition_for_media(media_df, target_bytes_per_partition=1 << 10)
    assert small.rdd.getNumPartitions() >= 2
    big = multimodal.repartition_for_media(media_df, target_bytes_per_partition=1 << 30)
    assert big.rdd.getNumPartitions() == 1


def test_frame_sample_plan(media_df):
    plan = multimodal.frame_sample_plan(media_df.filter(F.col("media_type") == "video"), 1000)
    idx = [r["frame_idx"] for r in plan.collect()]
    assert idx == [0, 1, 2, 3]  # 4500ms at 1000ms sampling


def test_pixel_decode_rejects_unknown_payloads(media_df):
    # r8: the gate is a clean input-domain error, not a stub marker —
    # PNG/WAV/baseline-JPEG all decode for real; video is out of scope
    with pytest.raises(ValueError):
        multimodal._decode_pixels(b"not-an-image")


# ---- baseline JPEG codec (r8: real huffman + DCT, stdlib + numpy) -------


def test_jpeg_uniform_blocks_roundtrip_exact():
    """Independent recompute of the q_multimodal_jpeg losslessness
    claim: uniform 8x8 blocks with EVEN level-shift offsets under the
    flat-16 quant table must survive encode->decode bit-exactly (only
    the DC coefficient 8k is nonzero and 8k/16 = k/2 is an exact
    integer for even k)."""
    import numpy as np

    h, w = 24, 32
    img = np.zeros((h, w), dtype=np.uint8)
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            img[by : by + 8, bx : bx + 8] = 128 + ((by * 7 + bx * 3) % 50) * 2 - 50
    payload = multimodal.encode_jpeg_baseline(img.tobytes(), w, h)
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    dec = multimodal.decode_jpeg_baseline(payload)
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, 1)
    out = np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(h, w)
    assert np.array_equal(out, img)


def test_jpeg_gradient_roundtrip_bounded_and_deterministic():
    """The lossy general case: a smooth gradient must round-trip
    within the flat-16 quantization error bound and decode must be a
    pure function of the payload."""
    import numpy as np

    img = np.fromfunction(lambda y, x: (2 * x + 3 * y) % 256, (40, 56)).astype(
        np.uint8
    )
    payload = multimodal.encode_jpeg_baseline(img.tobytes(), 56, 40)
    d1 = multimodal.decode_jpeg_baseline(payload)
    d2 = multimodal.decode_jpeg_baseline(payload)
    assert d1["pixels"] == d2["pixels"]
    out = np.frombuffer(d1["pixels"], dtype=np.uint8).reshape(40, 56)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 16  # measured 4; bound leaves quantizer slack


def test_jpeg_nonmultiple_of_8_dimensions():
    import numpy as np

    img = (np.arange(13 * 21, dtype=np.int64) % 200 + 20).astype(np.uint8)
    payload = multimodal.encode_jpeg_baseline(img.tobytes(), 21, 13)
    dec = multimodal.decode_jpeg_baseline(payload)
    assert (dec["width"], dec["height"]) == (21, 13)
    assert len(dec["pixels"]) == 21 * 13


def test_jpeg_decoder_accepts_fill_bytes_and_standalone_markers():
    """T.81 B.1.1.2 (ADVICE r8): 0xFF fill bytes may precede any
    marker code, and TEM (0x01) / stray RSTn are standalone (no length
    field). A foreign encoder's legal header must decode identically
    to our own canonical layout."""
    import numpy as np

    img = np.full((8, 8), 130, dtype=np.uint8)
    payload = multimodal.encode_jpeg_baseline(img.tobytes(), 8, 8)
    want = multimodal.decode_jpeg_baseline(payload)["pixels"]
    # splice after SOI: a fill-padded COM segment, a standalone TEM,
    # then a fill byte directly before the first real segment
    com = b"\xff\xff\xff\xfe" + (4).to_bytes(2, "big") + b"hi"
    tem = b"\xff\x01"
    fill = b"\xff"
    doctored = payload[:2] + com + tem + fill + payload[2:]
    got = multimodal.decode_jpeg_baseline(doctored)
    assert got["pixels"] == want
    assert (got["width"], got["height"]) == (8, 8)


def test_jpeg_decoder_truncated_fill_bytes_raise_value_error():
    """ADVICE r9: a payload truncated INSIDE trailing 0xFF fill bytes
    (or right after them) must raise the decoder's documented
    ValueError, not IndexError from the fill-skip walk running off
    the end."""
    import numpy as np

    img = np.full((8, 8), 130, dtype=np.uint8)
    payload = multimodal.encode_jpeg_baseline(img.tobytes(), 8, 8)
    for tail in (b"\xff", b"\xff\xff\xff", b""):
        # SOI, then nothing but fill bytes / empty: the marker walk
        # hits end-of-payload before any marker code
        with pytest.raises(ValueError):
            multimodal.decode_jpeg_baseline(payload[:2] + tail)


def test_jpeg_decoder_rejects_progressive_and_garbage():
    import struct

    with pytest.raises(ValueError):
        multimodal.decode_jpeg_baseline(b"GIF89a......")
    # a minimal SOF2 (progressive) frame header must be refused
    sof2 = (
        b"\xff\xd8"
        + b"\xff\xc2"
        + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 8, 8, 1)
        + b"\x01\x11\x00"
    )
    with pytest.raises(ValueError):
        multimodal.decode_jpeg_baseline(sof2)


def test_jpeg_dispatch_via_decode_pixels():
    import numpy as np

    img = np.full((8, 8), 130, dtype=np.uint8)
    payload = multimodal.encode_jpeg_baseline(img.tobytes(), 8, 8)
    dec = multimodal._decode_pixels(payload)
    assert dec["channels"] == 1
    assert np.array_equal(
        np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(8, 8), img
    )


# ---- dependency-free header decode (real path, no codec libs) ----------


def _png(w: int, h: int) -> bytes:
    import struct
    import zlib

    ihdr = struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        + struct.pack(">I", 0)
        + b"IEND\xaeB`\x82"
    )


def _gif(w: int, h: int) -> bytes:
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\xf7\x00\x00" + b"\x3b"


def _bmp(w: int, h: int) -> bytes:
    import struct

    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h)


def _wav(rate: int, data_size: int) -> bytes:
    import struct

    byte_rate = rate * 2  # mono 16-bit PCM
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", data_size)
        + b"\x00" * data_size
    )


def _jpeg(w: int, h: int) -> bytes:
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_parse_media_header_formats():
    assert multimodal.parse_media_header(_png(640, 480)) == {
        "fmt": "png", "width": 640, "height": 480,
        "sample_rate": None, "duration_ms": None,
    }
    assert multimodal.parse_media_header(_gif(320, 200))["width"] == 320
    assert multimodal.parse_media_header(_gif(320, 200))["fmt"] == "gif"
    assert multimodal.parse_media_header(_bmp(800, -600)) == {
        "fmt": "bmp", "width": 800, "height": 600,  # negative h = top-down
        "sample_rate": None, "duration_ms": None,
    }
    wav = multimodal.parse_media_header(_wav(16000, 64000))
    assert wav["fmt"] == "wav"
    assert wav["sample_rate"] == 16000
    assert wav["duration_ms"] == 64000 * 1000 // 32000  # 2000 ms
    jpg = multimodal.parse_media_header(_jpeg(1920, 1080))
    assert jpg == {
        "fmt": "jpeg", "width": 1920, "height": 1080,
        "sample_rate": None, "duration_ms": None,
    }


def test_parse_media_header_garbage_and_truncation():
    assert multimodal.parse_media_header(b"")["fmt"] == "unknown"
    assert multimodal.parse_media_header(b"not-media-at-all")["fmt"] == "unknown"
    # truncated mid-header: degrade, never raise
    assert multimodal.parse_media_header(_png(640, 480)[:12])["fmt"] == "unknown"
    assert multimodal.parse_media_header(_jpeg(10, 10)[:5])["fmt"] == "unknown"
    trunc_wav = multimodal.parse_media_header(_wav(8000, 100)[:16])
    assert trunc_wav["fmt"] == "unknown"


def test_decode_headers_dataframe(spark):
    rows = [
        (1, _png(64, 48), "image", (None, None, None, None)),
        (2, _wav(8000, 16000), "audio", (None, None, None, None)),
        (3, b"garbage", "video", (None, None, None, None)),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in multimodal.decode_headers(df).collect()}
    assert out[1]["fmt"] == "png" and out[1]["width"] == 64 and out[1]["height"] == 48
    assert out[2]["fmt"] == "wav" and out[2]["sample_rate"] == 8000
    assert out[2]["duration_ms"] == 1000  # 16000 bytes / 16000 B/s
    assert out[3]["fmt"] == "unknown" and out[3]["width"] is None
    assert out[3]["n_bytes"] == len(b"garbage")


def test_decode_headers_null_payload_degrades(spark):
    """A NULL payload must degrade exactly like a corrupt one — a media
    lake always contains some null blobs and one must never kill the
    Arrow batch (the parser contract)."""
    rows = [
        (1, _png(32, 16), "image", (None, None, None, None)),
        (2, None, "image", (None, None, None, None)),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in multimodal.decode_headers(df).collect()}
    assert out[1]["fmt"] == "png"
    assert out[2]["fmt"] == "unknown" and out[2]["n_bytes"] == 0


def _chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _raw_png(width, height, color_type, filtered_rows) -> bytes:
    """Assemble a PNG from HAND-WRITTEN filtered scanlines — the
    encoder is deliberately bypassed so the decoder is tested against
    the spec, not against our own encode path."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(bytes([f]) + bytes(row) for f, row in filtered_rows)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_decode_png_all_filters_hand_verified():
    """decode_png against hand-unfiltered expectations for every PNG
    filter type (spec section 9): none/sub/up in one image,
    average/paeth in another. Expected pixels computed by hand from
    the spec recurrences, NOT by running any code in this repo."""
    a = _raw_png(3, 3, 0, [
        (0, [10, 20, 30]),   # none  -> 10 20 30
        (1, [5, 5, 5]),      # sub   -> 5 10 15
        (2, [1, 2, 3]),      # up    -> 6 12 18
    ])
    d = multimodal.decode_png(a)
    assert (d["width"], d["height"], d["channels"]) == (3, 3, 1)
    assert list(d["pixels"]) == [10, 20, 30, 5, 10, 15, 6, 12, 18]

    b = _raw_png(3, 2, 0, [
        (3, [8, 10, 12]),    # average -> 8 14 19
        (4, [1, 1, 1]),      # paeth   -> 9 15 20
    ])
    d = multimodal.decode_png(b)
    assert list(d["pixels"]) == [8, 14, 19, 9, 15, 20]


def test_encode_decode_png_roundtrip_rgba():
    """encode_png -> decode_png round-trip on deterministic RGBA data;
    decode must return the exact source bytes."""
    w, h, ch = 17, 9, 4
    src = bytes((3 * i + 7) % 256 for i in range(w * h * ch))
    d = multimodal.decode_png(multimodal.encode_png(src, w, h, channels=ch))
    assert (d["width"], d["height"], d["channels"]) == (w, h, ch)
    assert d["pixels"] == src


def test_decode_wav_samples_stdlib():
    """Cross-checks the decoder q_multimodal_wav_features rides
    against python's stdlib wave writer (independent codec)."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        wv.writeframes(struct.pack("<4h", 0, 1000, -1000, 32767))
    d = multimodal.decode_wav_samples(buf.getvalue())
    assert d["channels"] == 1 and d["sample_rate"] == 8000
    assert d["n_frames"] == 4
    assert struct.unpack("<4h", d["samples"]) == (0, 1000, -1000, 32767)


def test_decode_pixels_dispatch_and_gate():
    """_decode_pixels (the q_multimodal_pixels decode layer): PNG, WAV
    and baseline JPEG decode for real
    (r8 — the JPEG codec closed the last NotImplementedError gate); a
    structurally broken JPEG fails with a parse error, not a stub."""
    png = multimodal.encode_png(bytes(range(16)), 4, 4, channels=1)
    assert multimodal._decode_pixels(png)["pixels"] == bytes(range(16))
    with pytest.raises(ValueError):
        multimodal._decode_pixels(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
