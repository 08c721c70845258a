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


def _decode_image(payload: bytes) -> dict:
    """Real image decode — gated on a codec library being present."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decode requires PIL/pillow (not in this container); "
            "deterministic_features() is the testable stand-in"
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
