"""Multimodal plumbing: asset schema, Arrow batch shapes, 1:N frame
fan-out, stub gating (SURVEY north-star multimodal columns)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from event_to_lakehouse_spark.multimodal.binary import (
    FRAME_STRIDE,
    as_assets,
    decode_audio,
    decode_image,
    extract_features,
    frame_sample,
    resize_assets,
    sample_frames,
)


@pytest.fixture(scope="module")
def assets(spark):
    docs = spark.createDataFrame(
        [(1, "a" * 300), (2, "b" * 100), (3, "")],
        ["doc_id", "text"],
    )
    return as_assets(docs)


def test_asset_schema_shape(assets):
    assert [f.name for f in assets.schema.fields] == ["asset_id", "payload", "meta"]
    assert assets.schema["payload"].dataType.simpleString() == "binary"
    meta = {f.name for f in assets.schema["meta"].dataType.fields}
    assert meta == {"mime", "width", "height", "dur_ms"}


def test_extract_features_batches(assets):
    rows = {r.asset_id: r for r in extract_features(assets).collect()}
    assert rows[1].n_bytes == 300 and rows[3].n_bytes == 0
    assert rows[2].sha == hashlib.sha256(b"b" * 100).hexdigest()
    assert rows[1].mime == "text/plain"


def test_resize_truncates_and_rewrites_meta(assets):
    out = {r.asset_id: r for r in resize_assets(assets, 4, 4).collect()}
    assert bytes(out[1].payload) == b"a" * 16
    assert bytes(out[3].payload) == b""  # shorter payloads pass through
    assert out[1].meta.width == 4 and out[1].meta.height == 4
    assert out[1].meta.mime == "text/plain"  # untouched meta preserved


def test_frame_fanout(assets):
    frames = sample_frames(assets).collect()
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r.asset_id, []).append(r)
    # 300 bytes at stride 128 → 3 frames (128, 128, 44); empty doc → 0
    assert [r.frame_bytes for r in sorted(by_asset[1], key=lambda r: r.frame_idx)] == [
        128,
        128,
        300 - 2 * 128,
    ]
    assert len(by_asset[2]) == 1
    assert 3 not in by_asset
    assert by_asset[1][0].frame_sha == hashlib.sha256(b"a" * FRAME_STRIDE).hexdigest()


def test_decode_stubs_are_gated():
    for stub in (decode_image, decode_audio, frame_sample):
        with pytest.raises(NotImplementedError):
            stub(b"payload")


def test_no_shuffle_in_multimodal_pipeline(assets):
    from event_to_lakehouse_spark.plans import audit_plan

    a = audit_plan(sample_frames(resize_assets(assets)))
    assert a.exchanges == 0  # decode chain is fully partition-local
