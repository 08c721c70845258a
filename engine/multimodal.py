"""Multimodal column processing (SURVEY.md §2.11 north-star surface).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct. All heavy per-item work runs as Arrow-batched
``mapInPandas`` transforms — the Spark-side plumbing (schemas, batch
iteration, partition sizing) is real and tested; the actual media
decoding is gated behind import-tries because codec libraries are not
in this container (the task contract allows a clearly-marked stub).

At 100 TB: media rows are large and skewed — the entry point
``repartition_for_media`` sizes partitions by byte budget rather than
row count before the Python stage, so a single 4K video cannot blow an
Arrow batch, and the decode stage parallelism matches executor cores.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:long>"
)

FEATURE_SCHEMA = "media_id long, n_bytes long, sha string, feature string"


def repartition_for_media(df: DataFrame, target_bytes_per_partition: int = 128 << 20) -> DataFrame:
    """Repartition by payload byte budget (not row count): media rows
    are wildly skewed and a row-count split overloads Arrow batches."""
    stats = df.select(F.sum(F.length("payload")).alias("b")).collect()[0]
    total = stats["b"] or 0
    n = max(1, int(total / target_bytes_per_partition) + 1)
    return df.repartition(n)


DECODE_SCHEMA = (
    "media_id long, fmt string, width int, height int, "
    "sample_rate int, duration_ms long, n_bytes long"
)


def parse_media_header(payload: bytes) -> dict:
    """Dependency-free container-header decode: PNG / GIF / BMP / WAV /
    JPEG dimensions and audio timing parsed straight from header bytes
    with ``struct`` — no codec library. This is the REAL metadata-decode
    path (what a catalog/stats pass runs over 100 TB of media); pixel/
    sample decoding still requires a codec and stays behind
    :func:`_decode_pixels`. Unknown or truncated payloads degrade to
    ``fmt='unknown'`` rather than raising — at scale a corrupt blob must
    not kill the batch."""
    import struct

    out: dict = {
        "fmt": "unknown",
        "width": None,
        "height": None,
        "sample_rate": None,
        "duration_ms": None,
    }
    b = bytes(payload or b"")
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            out.update(fmt="png", width=w, height=h)
        elif b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            w, h = struct.unpack("<HH", b[6:10])
            out.update(fmt="gif", width=w, height=h)
        elif b[:2] == b"BM" and len(b) >= 26:
            w, h = struct.unpack("<ii", b[18:26])
            out.update(fmt="bmp", width=w, height=abs(h))  # h<0 = top-down rows
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            rate = byte_rate = data_size = None
            pos = 12
            while pos + 8 <= len(b):  # RIFF chunk walk
                cid = b[pos : pos + 4]
                size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
                if cid == b"fmt " and pos + 20 <= len(b):
                    rate = struct.unpack("<I", b[pos + 12 : pos + 16])[0]
                    byte_rate = struct.unpack("<I", b[pos + 16 : pos + 20])[0]
                elif cid == b"data":
                    data_size = size
                pos += 8 + size + (size & 1)  # chunks are word-aligned
            if rate:
                out.update(fmt="wav", sample_rate=rate)
                if byte_rate and data_size is not None:
                    out.update(duration_ms=data_size * 1000 // byte_rate)
        elif b[:2] == b"\xff\xd8":  # JPEG: segment walk to the SOF marker
            pos = 2
            while pos + 4 <= len(b) and b[pos] == 0xFF:
                marker = b[pos + 1]
                if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOFn: baseline..progressive
                    h, w = struct.unpack(">HH", b[pos + 5 : pos + 9])
                    out.update(fmt="jpeg", width=w, height=h)
                    break
                if 0xD0 <= marker <= 0xD9:  # RSTn/SOI/EOI: no length field
                    pos += 2
                else:
                    pos += 2 + struct.unpack(">H", b[pos + 2 : pos + 4])[0]
    except struct.error:  # truncated mid-field: report what was sniffed
        pass
    return out


def decode_headers(df: DataFrame) -> DataFrame:
    """Arrow-batched header decode over (media_id, payload) rows:
    :func:`parse_media_header` per item inside ``mapInPandas``. Pair
    with :func:`repartition_for_media` upstream so batch byte size is
    bounded regardless of row skew."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads must degrade like corrupt ones (bytes(None)
            # would kill the task — the exact failure the parser's
            # contract forbids)
            payloads = pdf["payload"].map(
                lambda b: b"" if b is None else bytes(b)
            )
            metas = payloads.map(parse_media_header)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "fmt": metas.map(lambda m: m["fmt"]),
                    "width": pd.array(
                        [m["width"] for m in metas], dtype="Int32"
                    ),
                    "height": pd.array(
                        [m["height"] for m in metas], dtype="Int32"
                    ),
                    "sample_rate": pd.array(
                        [m["sample_rate"] for m in metas], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        [m["duration_ms"] for m in metas], dtype="Int64"
                    ),
                    "n_bytes": payloads.map(len).astype("int64"),
                }
            )

    return df.mapInPandas(run, DECODE_SCHEMA)


def _decode_pixels(payload: bytes) -> dict:
    """Pixel/sample-level decode — still gated on a codec library (the
    container ships none); header metadata needs no codec, see
    :func:`parse_media_header`."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "pixel decode requires PIL/pillow (not in this container); "
            "parse_media_header() covers header metadata without it"
        ) from e
    raise NotImplementedError("wire PIL decode here when the codec lands")


def deterministic_features(df: DataFrame) -> DataFrame:
    """Deterministic stand-in for decode/feature-extract: byte length,
    sha256 fingerprint and a head-byte 'feature'. Exercises the exact
    batch shape real decode would use."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"].map(bytes)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "feature": payloads.map(lambda b: b[:8].hex()),
                }
            )

    return df.mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: computes the frame index list per video
    row from metadata only (no decode) — the plan a real sampler would
    explode into per-frame work items."""
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return df.select(
        "media_id",
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))).alias("frame_idx"),
    ).select("media_id", F.explode("frame_idx").alias("frame_idx"))
