"""Multimodal binary-column plumbing tests."""

from __future__ import annotations

import pytest

from yfinance_etl_spark.multimodal.columns import (
    _decode_payload,
    image_features,
    sample_frames,
    synthesize_image_assets,
)


def _docs(spark):
    return spark.createDataFrame(
        [(0, "abc"), (65, "hello world")], "doc_id bigint, text string"
    )


def test_asset_schema_and_payload(spark):
    assets = synthesize_image_assets(_docs(spark))
    assert [f.name for f in assets.schema.fields] == ["doc_id", "content", "meta"]
    assert assets.schema["content"].dataType.simpleString() == "binary"
    row = assets.filter("doc_id = 0").collect()[0]
    assert bytes(row.content) == b"IMG|64|48|abc"
    assert row.meta.kind == "image" and row.meta.width == 64


def test_image_features_values(spark):
    feats = {r.doc_id: r for r in image_features(synthesize_image_assets(_docs(spark))).collect()}
    # doc 0: body 'abc' → checksum (97+98+99) % 256 = 38; payload 13 bytes
    assert feats[0].checksum == 38 and feats[0].n_bytes == 13
    # doc 65: w = 64 + 65%64 = 65, h = 48 + 65%48 = 65
    assert feats[65].width == 65 and feats[65].height == 65


def test_decode_rejects_unknown_format():
    with pytest.raises(NotImplementedError, match="imaging library"):
        _decode_payload(b"\x89PNG....")


def test_sample_frames_stride(spark):
    df = spark.createDataFrame([(1, "f0\x00f1\x00f2\x00f3\x00f4")], "doc_id bigint, text string")
    assets = synthesize_image_assets(df)
    got = sorted((r.frame_id, r.frame_bytes) for r in sample_frames(assets, every_n=2).collect())
    assert [f for f, _ in got] == [0, 2, 4]
