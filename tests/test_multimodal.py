"""Multimodal plumbing: binary columns through mapInPandas — schema,
determinism, size-aware partitioning, quality blend, frame sampling."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from trendr_data_pipeline_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def images(spark):
    rows = [(i, bytes([i % 256]) * (1000 + i * 37)) for i in range(50)]
    return spark.createDataFrame(rows, "item_id long, data binary")


def test_extract_features_schema_and_determinism(images):
    out = MM.extract_image_features(images)
    assert out.schema.simpleString() == (
        "struct<item_id:bigint,width:int,height:int,format:string,"
        "n_bytes:bigint,content_hash:string,brightness:double,"
        "contrast:double,saturation:double>"
    )
    rows1 = {r["item_id"]: r for r in out.collect()}
    rows2 = {r["item_id"]: r for r in MM.extract_image_features(images).collect()}
    assert len(rows1) == 50
    for k in rows1:
        assert rows1[k] == rows2[k]  # deterministic decode
    # content hash matches local computation
    data0 = bytes([0]) * 1000
    assert rows1[0]["content_hash"] == hashlib.sha256(data0).hexdigest()[:16]
    assert rows1[0]["n_bytes"] == 1000


def test_codec_gate_branch(images, spark):
    """The codec gate always exercises its applicable branch — no
    skips: without Pillow, strict mode must raise; with Pillow, the
    PIL path must decode (assertions in the helper below)."""
    if not MM.HAVE_PIL:
        with pytest.raises(NotImplementedError):
            MM.extract_image_features(images, strict=True)
    else:
        _assert_pil_decode(spark)


def test_ppm_decode_real_codec_path(spark):
    """The dependency-free REAL decoder: binary P6 payloads built by
    hand, parsed and measured by _ppm_decode — exact pixel statistics,
    schema, and malformed-input rejection."""
    def ppm(w, h, pixels):  # pixels: flat [(r,g,b), ...] row-major
        body = bytes(v for px in pixels for v in px)
        return f"P6\n{w} {h}\n255\n".encode() + body

    solid = ppm(4, 2, [(128, 64, 32)] * 8)
    white = ppm(2, 2, [(255, 255, 255)] * 4)
    # 2×1: black and pure red — known stddev and saturation
    duo = ppm(2, 1, [(0, 0, 0), (255, 0, 0)])
    rows = [(1, solid), (2, white), (3, duo)]
    images = spark.createDataFrame(rows, "item_id long, data binary")
    out = MM.extract_image_features(images, codec="ppm")
    got = {r["item_id"]: r for r in out.collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["format"]) == (4, 2, "ppm")
    assert got[1]["brightness"] == pytest.approx((128 + 64 + 32) / 3, abs=1e-9)
    assert got[1]["contrast"] == pytest.approx(0.0, abs=1e-9)
    assert got[1]["saturation"] == pytest.approx((96 / 128) * 255, abs=1e-9)
    assert got[1]["n_bytes"] == len(solid)
    assert got[2]["brightness"] == pytest.approx(255.0)
    assert got[2]["saturation"] == pytest.approx(0.0)
    # duo: R channel mean 127.5, std 127.5; G/B std 0 → contrast 42.5;
    # saturation: black pixel 0 (max=0), red pixel 255 → mean 127.5
    assert got[3]["brightness"] == pytest.approx(255 / 6, abs=1e-9)
    assert got[3]["contrast"] == pytest.approx(127.5 / 3, abs=1e-9)
    assert got[3]["saturation"] == pytest.approx(127.5, abs=1e-9)

    for bad in (b"P5\n2 2\n255\n" + b"\0" * 12,      # wrong magic
                b"P6\n2 2\n65535\n" + b"\0" * 24,    # unsupported maxval
                b"P6\n4 4\n255\n" + b"\0" * 10):     # truncated payload
        with pytest.raises(ValueError):
            MM._ppm_decode(bad)


def _assert_pil_decode(spark):
    """The PIL decoder branch produces the declared schema and true
    pixel statistics (brightness = mean RGB / 255) on images generated
    by the codec itself."""
    import io

    from PIL import Image

    def png(rgb, size):
        buf = io.BytesIO()
        Image.new("RGB", size, rgb).save(buf, format="PNG")
        return buf.getvalue()

    rows = [(1, png((128, 64, 32), (320, 200))), (2, png((255, 255, 255), (64, 48)))]
    images = spark.createDataFrame(rows, "item_id long, data binary")
    out = MM.extract_image_features(images, codec="pil")
    assert out.schema.simpleString() == (
        "struct<item_id:bigint,width:int,height:int,format:string,"
        "n_bytes:bigint,content_hash:string,brightness:double,"
        "contrast:double,saturation:double>"
    )
    got = {r["item_id"]: r for r in out.collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["format"]) == (320, 200, "png")
    assert got[1]["brightness"] == pytest.approx((128 + 64 + 32) / 3, abs=1e-9)
    assert got[1]["contrast"] == pytest.approx(0.0, abs=1e-9)  # solid color
    # HSV S for (128,64,32): (max-min)/max scaled to 255 (PIL integer math)
    assert got[1]["saturation"] == pytest.approx((96 / 128) * 255, abs=2.0)
    assert got[2]["brightness"] == pytest.approx(255.0, abs=1e-9)
    assert got[2]["saturation"] == pytest.approx(0.0, abs=1e-9)
    # the quality blend consumes the real features unchanged
    q = {r["item_id"]: r["quality_score"] for r in MM.photo_quality_score(out).collect()}
    assert all(0.0 <= v <= 1.0 for v in q.values())


def _oracle_quality(r):
    """Port of the reference's scoring curves
    (utils/photo_manager.py:157-226) as the test oracle."""
    w, h, n_bytes = r["width"], r["height"], r["n_bytes"]
    pixels = w * h
    res = min(1.0, pixels / 960_000) if pixels >= 480_000 else pixels / 480_000

    def band(v, lo, hi, over_div, floor):
        if lo <= v <= hi:
            return 1.0
        if v < lo:
            return v / lo
        return max(floor, 1.0 - ((v - hi) / over_div))

    bright = band(r["brightness"], 80, 180, 75, 0.1)
    contrast = band(r["contrast"], 20, 60, 40, 0.1)
    sat = band(r["saturation"], 60, 200, 55, 0.3)
    ar = w / h
    comp = 0.5
    for pw, ph in MM.ASPECT_RATIOS:
        d = abs(ar - pw / ph)
        if d < 0.2:
            comp = 1.0
            break
        if d < 0.5:
            comp = max(comp, 0.8)
    if 50_000 <= n_bytes <= 500_000:
        size = 1.0
    elif n_bytes < 50_000:
        size = n_bytes / 50_000
    else:
        size = max(0.3, 1.0 - ((n_bytes - 500_000) / 1_000_000))
    ww = MM.QUALITY_WEIGHTS
    return (
        ww["resolution"] * res + ww["brightness"] * bright + ww["contrast"] * contrast
        + ww["saturation"] * sat + ww["composition"] * comp + ww["file_size"] * size
    )


def test_quality_score_reference_curves(images):
    scored = MM.photo_quality_score(MM.extract_image_features(images))
    rows = scored.collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)
    # weights sum to 1 → max possible is 1
    assert sum(MM.QUALITY_WEIGHTS.values()) == pytest.approx(1.0)
    for r in rows:
        # Spark round() is HALF_UP, Python round() banker's — compare
        # against the unrounded oracle at half-ulp-of-6dp tolerance
        assert r["quality_score"] == pytest.approx(_oracle_quality(r), abs=5.1e-7)


def test_size_aware_partitioning(spark):
    big = spark.createDataFrame(
        [(i, bytes(1 << 20)) for i in range(10)], "item_id long, data binary"
    )
    n = MM.estimate_partitions(big, "data", target_batch_bytes=4 << 20)
    assert n == 3  # 10 MB / 4 MB → 3 partitions


def test_video_frame_sampling(spark):
    videos = spark.createDataFrame(
        [(1, b"xx", 12.0), (2, b"yy", 0.5)], "item_id long, data binary, duration_s double"
    )
    rows = MM.sample_video_frames(videos, every_n_seconds=5.0).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["item_id"], []).append(r["frame_ts"])
    assert sorted(by_id[1]) == [0.0, 5.0, 10.0]
    assert by_id[2] == [0.0]


def test_audio_windows_shape_and_decode(spark):
    """Audio leg: one row per ceil(duration) window, duration from
    16-bit-PCM byte length, rms = sha256 digest byte (cycled) / 255."""
    import hashlib
    import math

    from trendr_data_pipeline_spark.operators.multimodal import extract_audio_features

    payloads = [(1, b"x" * 100, 8), (2, b"hello world" * 30, 4), (3, b"ab", 8)]
    audio = spark.createDataFrame(
        payloads, "item_id long, data binary, sample_rate long"
    )
    rows = extract_audio_features(audio).collect()
    by_item = {}
    for r in rows:
        by_item.setdefault(r["item_id"], []).append(r)
    for item_id, data, rate in payloads:
        duration = (len(data) // 2) / rate
        n_win = max(1, math.ceil(duration))
        got = sorted(by_item[item_id], key=lambda r: r["window_idx"])
        assert [r["window_idx"] for r in got] == list(range(n_win))
        digest = hashlib.sha256(data).digest()
        for r in got:
            want_rms = digest[r["window_idx"] % 32] / 255.0
            assert r["rms"] == want_rms
            assert r["is_silent"] == (want_rms < 0.05)
            assert r["duration_s"] == duration
