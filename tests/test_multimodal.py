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


def test_image_decode_is_gated(media_df):
    with pytest.raises(NotImplementedError):
        multimodal._decode_image(b"not-an-image")
