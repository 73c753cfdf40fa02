"""Multimodal plumbing: schema, payload integrity, deterministic fake
features, frame-sampling shape, decode stub."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from blink_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def assets(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "a" * 5000), (3, "")],
        "doc_id long, text string",
    )
    return mm.assets_from_documents(docs).cache()


def test_asset_schema_and_metadata(assets):
    meta = {r["asset_id"]: r for r in mm.asset_metadata(assets).collect()}
    assert meta[1]["n_bytes"] == 11
    assert meta[1]["payload_sha256"] == hashlib.sha256(b"hello world").hexdigest()
    assert meta[3]["n_bytes"] == 0
    assert set(assets.schema.fieldNames()) == {"asset_id", "kind", "payload", "meta"}
    assert assets.schema["meta"].dataType.fieldNames() == [
        "mime", "n_bytes", "width", "height", "sample_rate", "duration_ms",
    ]


def test_extract_features_deterministic(assets):
    f1 = {r["asset_id"]: r for r in mm.extract_features(assets).collect()}
    f2 = {r["asset_id"]: r for r in mm.extract_features(assets.repartition(3)).collect()}
    for aid in f1:
        assert f1[aid]["features"] == f2[aid]["features"]
        assert len(f1[aid]["features"]) == mm.N_FEATURES
        assert f1[aid]["sha256"] == f2[aid]["sha256"]
    # features are an L1-normalized histogram (or zeros for empty)
    assert sum(f1[1]["features"]) == pytest.approx(1.0)
    assert sum(f1[3]["features"]) == 0.0
    exp = mm.byte_features(b"hello world")
    assert np.allclose(f1[1]["features"], exp)


def test_sample_frames_shape(assets):
    frames = mm.sample_frames(assets, every_n_bytes=1024)
    per = {r["asset_id"]: r["cnt"] for r in
           frames.groupBy("asset_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert per[1] == 1          # 11 bytes -> 1 frame
    assert per[2] == 5          # 5000 bytes -> ceil(5000/1024) = 5
    assert per[3] == 1          # empty payload still yields 1 frame row
    offs = [r["byte_offset"] for r in frames.where(F.col("asset_id") == 2)
            .orderBy("frame_no").collect()]
    assert offs == [0, 1024, 2048, 3072, 4096]


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_real(b"bytes", "image/png")
