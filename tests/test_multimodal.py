"""Multimodal plumbing: schema, payload integrity, deterministic fake
features, frame-sampling shape, real PPM/BMP/WAV decode round-trips."""

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


def test_decode_unknown_magic_raises():
    with pytest.raises(ValueError, match="unknown magic"):
        mm.decode_real(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)


def _rand_pixels(seed, h, w):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)


def test_ppm_round_trip():
    px = _rand_pixels(1, 7, 11)
    d = mm.decode_real(mm.encode_ppm(px))
    assert d["fmt"] == "ppm" and d["width"] == 11 and d["height"] == 7
    assert np.array_equal(d["data"], px)


def test_ppm_with_comment_header():
    px = _rand_pixels(4, 2, 3)
    payload = mm.encode_ppm(px)
    commented = b"P6\n# a comment line\n3 2\n255\n" + payload.split(b"255\n", 1)[1]
    d = mm.decode_real(commented)
    assert np.array_equal(d["data"], px)


def test_bmp_round_trip_including_row_padding():
    # w=5: 15-byte rows pad to 16 — exercises the 4-byte alignment
    px = _rand_pixels(2, 4, 5)
    d = mm.decode_real(mm.encode_bmp(px))
    assert d["fmt"] == "bmp" and d["width"] == 5 and d["height"] == 4
    assert np.array_equal(d["data"], px)


def test_wav_round_trip():
    rng = np.random.RandomState(3)
    samples = rng.randint(-32768, 32767, (1000, 2)).astype(np.int16)
    d = mm.decode_real(mm.encode_wav(samples, sample_rate=22050))
    assert d["fmt"] == "wav"
    assert d["sample_rate"] == 22050 and d["channels"] == 2
    assert d["n_samples"] == 1000
    assert np.array_equal(d["data"], samples)


def test_extract_features_real_decode(spark):
    px = _rand_pixels(5, 6, 6)
    rows = [
        (1, "image/x-portable-pixmap", bytearray(mm.encode_ppm(px)), None),
        (2, "image/bmp", bytearray(mm.encode_bmp(px)), None),
        (3, "audio/wav", bytearray(mm.encode_wav(
            np.arange(-500, 500, dtype=np.int16))), None),
    ]
    df = spark.createDataFrame(rows, mm.ASSET_SCHEMA)
    feats = {r["asset_id"]: r["features"]
             for r in mm.extract_features(df, use_real_decode=True).collect()}
    # ppm and bmp carry identical pixels -> identical decoded features
    assert feats[1] == feats[2]
    assert abs(sum(feats[3]) - 1.0) < 1e-12
    exp = mm.decoded_features(mm.decode_real(mm.encode_ppm(px))).tolist()
    assert feats[1] == exp


def test_decode_metadata_df(spark):
    docs = spark.createDataFrame(
        [(0, "hello world " * 20), (5, ""), (9, "abc")],
        "doc_id long, text string",
    )
    assets = mm.ppm_assets_from_documents(docs)
    meta = {r["asset_id"]: r for r in mm.decode_metadata(assets).collect()}
    for did in (0, 5, 9):
        w, h = 4 + did % 13, 3 + did % 7
        assert meta[did]["width"] == w and meta[did]["height"] == h
        assert meta[did]["n_pixels"] == w * h
        raw = (dict([(0, "hello world " * 20), (5, ""), (9, "abc")])[did]
               ).encode()[: w * h * 3]
        assert meta[did]["content_sum"] == sum(raw)
