from __future__ import annotations

import hashlib

import pytest

from dc43_spark.functions import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"fake-png-bytes-1", ("png", 64, 48, None)),
        (2, "image", b"fake-png-bytes-2", ("png", 32, 32, None)),
        (3, "audio", b"fake-wav-bytes", ("wav", None, None, 2500)),
        (4, "video", b"fake-mp4-bytes", ("mp4", 640, 480, 3200)),
        (5, "image", None, ("png", 1, 1, None)),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_payload_stats_jvm_only(media):
    out = {r["media_id"]: r for r in mm.payload_stats(media).collect()}
    assert out[1]["n_bytes"] == len(b"fake-png-bytes-1")
    assert out[1]["content_hash"] == hashlib.md5(b"fake-png-bytes-1").hexdigest()
    assert out[5]["n_bytes"] is None  # null payload
    plan = mm.payload_stats(media)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_extract_features_deterministic(media):
    out = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    assert len(out) == 5
    expected = [b / 255.0 for b in hashlib.sha256(b"fake-png-bytes-1").digest()[:8]]
    assert out[1]["feature"] == pytest.approx(expected, abs=1e-6)
    assert out[1]["content_hash"] == hashlib.md5(b"fake-png-bytes-1").hexdigest()
    # null payload handled as empty bytes
    assert out[5]["n_bytes"] == 0
    # rerun gives identical features (stubbed decoder is deterministic)
    again = {r["media_id"]: r["feature"] for r in mm.extract_features(media).collect()}
    assert again[3] == out[3]["feature"]


def test_feature_schema_stable(media):
    df = mm.extract_features(media)
    assert df.schema == mm.FEATURE_SCHEMA


def test_frame_sample_plan(media):
    frames = mm.frame_sample_plan(media, every_ms=1000).collect()
    # 3200ms video -> frames at 0,1000,2000 (idx 0..2)
    assert [(r["frame_idx"], r["frame_ts_ms"]) for r in frames] == [
        (0, 0), (1, 1000), (2, 2000),
    ]
