"""Multimodal queries over ``documents``-derived binary columns (A15
+ frame sampling, north-star multimodal ops).

The decode step in this image is the deterministic sha256-based fake
(`operators/multimodal._fake_decode`) — which makes the ENTIRE
multimodal path SQL-expressible: DuckDB recomputes the same sha256
bytes (`sha256` + hex-pair casts), the same synthetic dimensions and
pixel stats, and the same reference quality curves
(utils/photo_manager.py:157-226), so the driver hash-checks the full
mapInPandas plumbing end to end. With a real codec (codec='pil') the
Spark side swaps decoders and the oracle no longer applies — the
PIL-gated pytest covers that branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register

#: hex-pair byte i of sha256(text) as an integer (DuckDB side)
_HB = "('0x' || substr(hx, {i} * 2 + 1, 2))::INT"


#: the shared quality-blend SQL tail (reference photo_manager curves)
def _quality_blend_sql(bright: str, contrast: str, sat: str) -> str:
    return f"""
             0.25e0 * (CASE WHEN pixels >= 480000.0e0
                          THEN LEAST(1.0e0, pixels / 960000.0e0)
                          ELSE pixels / 480000.0e0 END)
           + 0.20e0 * ({bright})
           + 0.20e0 * ({contrast})
           + 0.15e0 * ({sat})
           + 0.10e0 * (CASE WHEN LEAST(ABS(ar - 16.0e0/9.0e0), ABS(ar - 4.0e0/3.0e0),
                                     ABS(ar - 3.0e0/2.0e0), ABS(ar - 1.0e0)) < 0.2e0 THEN 1.0e0
                          WHEN LEAST(ABS(ar - 16.0e0/9.0e0), ABS(ar - 4.0e0/3.0e0),
                                     ABS(ar - 3.0e0/2.0e0), ABS(ar - 1.0e0)) < 0.5e0 THEN 0.8e0
                          ELSE 0.5e0 END)
           + 0.10e0 * (CASE WHEN n_bytes BETWEEN 50000 AND 500000 THEN 1.0e0
                          WHEN n_bytes < 50000 THEN n_bytes / 50000.0e0
                          ELSE GREATEST(0.3e0, 1.0e0 - ((n_bytes - 500000.0e0) / 1000000.0e0)) END)
    """


def _photo_quality_twin_sql() -> str:
    hb = [_HB.format(i=i) for i in range(6)]
    # every literal is e0-suffixed: DuckDB otherwise types them DECIMAL
    # and evaluates literal sub-chains in exact decimal, diverging from
    # Spark's pure-double arithmetic at ~1e-12 — enough to straddle the
    # canonicalizer's 9-dp rounding boundary
    band = (
        "CASE WHEN {v} BETWEEN {lo} AND {hi} THEN 1.0e0"
        " WHEN {v} < {lo} THEN {v} / {lo}"
        " ELSE GREATEST({floor}, 1.0e0 - (({v} - {hi}) / {div})) END"
    )
    bright = band.format(v="brightness", lo="80.0e0", hi="180.0e0", div="75.0e0", floor="0.1e0")
    contrast = band.format(v="contrast", lo="20.0e0", hi="60.0e0", div="40.0e0", floor="0.1e0")
    sat = band.format(v="saturation", lo="60.0e0", hi="200.0e0", div="55.0e0", floor="0.3e0")
    return f"""
    WITH img AS (
        SELECT doc_id AS item_id, sha256(text) AS hx,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    ), feat AS (
        SELECT item_id,
               64 + ({hb[0]}) % 192 AS width,
               64 + ({hb[1]}) % 192 AS height,
               CASE ({hb[2]}) % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END
                   AS format,
               n_bytes,
               substr(hx, 1, 16) AS content_hash,
               CAST({hb[3]} AS DOUBLE) AS brightness,
               CAST(({hb[4]}) % 128 AS DOUBLE) AS contrast,
               CAST({hb[5]} AS DOUBLE) AS saturation
        FROM img
    ), curves AS (
        SELECT *,
               CAST(width * height AS DOUBLE) AS pixels,
               CAST(width AS DOUBLE) / height AS ar
        FROM feat
    )
    SELECT 'fake' AS codec, item_id, width, height, format, n_bytes, content_hash,
           brightness, contrast, saturation,
           {_quality_blend_sql(bright, contrast, sat)} AS quality_score
    FROM curves
    """


def _ppm_twin_sql() -> str:
    """Algorithm twin for the REAL ppm decode leg: DuckDB re-enumerates
    every pixel of the synthesized P6 images (same generator arithmetic
    as ``_ppm_payload``) and recomputes the decoder's exact statistics
    — mean byte, mean per-channel population stddev, float HSV-S mean —
    then the same quality curves. n_bytes counts the actual header
    (9 + digits of w + digits of h) plus 3·w·h payload bytes."""
    band = (
        "CASE WHEN {v} BETWEEN {lo} AND {hi} THEN 1.0e0"
        " WHEN {v} < {lo} THEN {v} / {lo}"
        " ELSE GREATEST({floor}, 1.0e0 - (({v} - {hi}) / {div})) END"
    )
    bright = band.format(v="brightness", lo="80.0e0", hi="180.0e0", div="75.0e0", floor="0.1e0")
    contrast = band.format(v="contrast", lo="20.0e0", hi="60.0e0", div="40.0e0", floor="0.1e0")
    sat = band.format(v="saturation", lo="60.0e0", hi="200.0e0", div="55.0e0", floor="0.3e0")
    return f"""
    WITH dims AS (
        SELECT doc_id AS item_id,
               8 + doc_id % 4 AS w, 6 + doc_id % 3 AS h
        FROM documents
    ), px AS (
        SELECT item_id, w, h,
               CAST((x*7 + y*13 + item_id*31) % 256 AS DOUBLE) AS r,
               CAST((x*7 + y*13 + item_id*31 + 97) % 256 AS DOUBLE) AS g,
               CAST((x*7 + y*13 + item_id*31 + 194) % 256 AS DOUBLE) AS b
        FROM dims
        CROSS JOIN UNNEST(range(w)) tx(x)
        CROSS JOIN UNNEST(range(h)) ty(y)
    ), stats AS (
        SELECT item_id, ANY_VALUE(w) AS width, ANY_VALUE(h) AS height,
               (AVG(r) + AVG(g) + AVG(b)) / 3.0e0 AS brightness,
               (STDDEV_POP(r) + STDDEV_POP(g) + STDDEV_POP(b)) / 3.0e0 AS contrast,
               AVG(CASE WHEN GREATEST(r, g, b) > 0
                        THEN (GREATEST(r, g, b) - LEAST(r, g, b))
                             / GREATEST(r, g, b) * 255.0e0
                        ELSE 0.0e0 END) AS saturation
        FROM px GROUP BY item_id
    ), curves AS (
        SELECT item_id, width, height,
               'ppm' AS format,
               9 + length(CAST(width AS VARCHAR)) + length(CAST(height AS VARCHAR))
                 + 3 * width * height AS n_bytes,
               CAST(NULL AS VARCHAR) AS content_hash,
               brightness, contrast, saturation,
               CAST(width * height AS DOUBLE) AS pixels,
               CAST(width AS DOUBLE) / height AS ar
        FROM stats
    )
    SELECT 'ppm' AS codec, item_id, width, height, format, n_bytes, content_hash,
           brightness, contrast, saturation,
           {_quality_blend_sql(bright, contrast, sat)} AS quality_score
    FROM curves
    """


def _ppm_payload():
    """pandas UDF: doc_id → a real binary-PPM (P6) payload whose pixel
    bytes follow the deterministic generator arithmetic the DuckDB twin
    re-enumerates: channel k of pixel (x, y) is
    (7x + 13y + 31·doc_id + 97k) mod 256, dims (8 + id%4) × (6 + id%3)."""
    import numpy as np
    import pandas as pd

    def f(ids):
        out = []
        for i in ids:
            i = int(i)
            w, h = 8 + i % 4, 6 + i % 3
            xs = np.arange(w, dtype=np.int64)
            ys = np.arange(h, dtype=np.int64)
            chan = np.array([0, 97, 194], dtype=np.int64)
            arr = (
                xs[None, :, None] * 7 + ys[:, None, None] * 13 + i * 31 + chan[None, None, :]
            ) % 256
            out.append(f"P6\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes())
        return pd.Series(out)

    return F.pandas_udf(f, "binary")


@register(
    # z-pushed r12 (RENAMES_R12): admits c56_grid_scan_cycle into the
    # driver window; driver-signed as p05 in r9-r11 windows
    "zp05_photo_quality",
    f"""
    SELECT * FROM ({_photo_quality_twin_sql()})
    UNION ALL
    SELECT * FROM ({_ppm_twin_sql()})
    """,
)
def p05_photo_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 end to end through the driver gate, BOTH decode legs united
    under a ``codec`` label:

    - ``fake``: documents' utf-8 bytes as opaque payloads → size-aware
      mapInPandas decode (deterministic sha256 fake) → quality curves;
      oracle recomputes every step from the same sha256.
    - ``ppm`` (r4): synthesized REAL binary-PPM images decoded by the
      pure-Python P6 parser (`operators/multimodal._ppm_decode` —
      actual header parsing + pixel statistics over real bytes);
      oracle re-enumerates the pixels and recomputes the decoder's
      statistics analytically. This closes the real-codec gap without
      Pillow: a genuine decode is hash-gated, not skipped.

    content_hash is NULL on the ppm leg (DuckDB cannot assemble the
    binary payload to hash it; the decode statistics are the gate)."""
    from ..operators.multimodal import extract_image_features, photo_quality_score

    docs = read_table(spark, sf_dir, "documents")
    images = docs.select(
        F.col("doc_id").alias("item_id"), F.encode(F.col("text"), "utf-8").alias("data")
    )
    # round_to=None: the driver's canonicalizer rounds both engines'
    # doubles identically at 9 dp; an explicit 6-dp round diverges at
    # boundaries (Spark HALF_UP on exact BigDecimal vs DuckDB's scaled
    # double round)
    fake = photo_quality_score(extract_image_features(images), round_to=None).select(
        F.lit("fake").alias("codec"),
        "item_id", "width", "height", "format", "n_bytes", "content_hash",
        "brightness", "contrast", "saturation", "quality_score",
    )
    ppm_images = docs.select(
        F.col("doc_id").alias("item_id"), _ppm_payload()(F.col("doc_id")).alias("data")
    )
    # n_partitions pinned: the payload column is UDF-built, so the
    # byte-budget estimator would evaluate the builder twice; ~250-byte
    # images make parallelism, not batch size, the binding constraint
    ppm = photo_quality_score(
        extract_image_features(ppm_images, codec="ppm", n_partitions=8), round_to=None
    ).select(
        F.lit("ppm").alias("codec"),
        "item_id", "width", "height", "format", "n_bytes",
        F.lit(None).cast("string").alias("content_hash"),
        "brightness", "contrast", "saturation", "quality_score",
    )
    return fake.unionByName(ppm)


@register(
    "zp06_frame_sampling",
    """
    SELECT doc_id AS item_id,
           octet_length(encode(text)) AS n_bytes,
           i * 5.0 AS frame_ts
    FROM documents
    CROSS JOIN UNNEST(range(0, FLOOR(len(text) / 10.0 / 5.0)::BIGINT + 1)) AS t(i)
    """,
)
def p06_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing through the driver gate: payload
    = utf-8 bytes, duration = chars/10 s, one row per 5 s sample
    offset — the JVM-side sequence explode of
    `operators/multimodal.sample_video_frames` vs a range() oracle."""
    from ..operators.multimodal import sample_video_frames

    docs = read_table(spark, sf_dir, "documents")
    videos = docs.select(
        F.col("doc_id").alias("item_id"),
        F.encode(F.col("text"), "utf-8").alias("data"),
        (F.length(F.col("text")) / 10.0).alias("duration_s"),
    )
    return sample_video_frames(videos, every_n_seconds=5.0)


@register(
    "zp07_audio_windows",
    """
    WITH audio AS (
        SELECT doc_id AS item_id, sha256(text) AS hx,
               octet_length(encode(text)) AS n_bytes,
               8 + (doc_id % 5) * 4 AS sample_rate
        FROM documents
    ), d AS (
        SELECT item_id, n_bytes, sample_rate,
               CAST(n_bytes // 2 AS DOUBLE) / sample_rate AS duration_s,
               GREATEST(1, CAST(CEIL(CAST(n_bytes // 2 AS DOUBLE) / sample_rate) AS INT))
                   AS n_win
        FROM audio
    )
    SELECT d.item_id, d.n_bytes, CAST(d.sample_rate AS BIGINT) AS sample_rate,
           d.duration_s,
           CAST(w AS INT) AS window_idx,
           (('0x' || substr(a.hx, CAST(w % 32 AS INT) * 2 + 1, 2))::INT) / 255.0e0 AS rms,
           (('0x' || substr(a.hx, CAST(w % 32 AS INT) * 2 + 1, 2))::INT) / 255.0e0 < 0.05e0
               AS is_silent
    FROM d JOIN audio a ON d.item_id = a.item_id
    CROSS JOIN UNNEST(range(d.n_win)) AS t(w)
    """,
)
def p07_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio leg end to end: documents' bytes as 16-bit-PCM payloads
    (sample rates scaled down so the tiny fixture payloads span
    multi-window timelines) → 1:N mapInPandas loudness windows with
    the sha256 fake decode. The oracle recomputes every window in
    DuckDB from the same digest."""
    from ..operators.multimodal import extract_audio_features

    docs = read_table(spark, sf_dir, "documents")
    audio = docs.select(
        F.col("doc_id").alias("item_id"),
        F.encode(F.col("text"), "utf-8").alias("data"),
        (8 + (F.col("doc_id") % 5) * 4).alias("sample_rate"),
    )
    return extract_audio_features(audio)
