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
    SELECT item_id, width, height, format, n_bytes, content_hash,
           brightness, contrast, saturation,
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
            AS quality_score
    FROM curves
    """


@register("p05_photo_quality", _photo_quality_twin_sql())
def p05_photo_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 end to end through the driver gate: documents' utf-8 bytes
    as binary image payloads → size-aware mapInPandas decode (the
    deterministic sha256 fake) → the reference's full quality curves.
    The oracle recomputes every step in DuckDB from the same sha256."""
    from ..operators.multimodal import extract_image_features, photo_quality_score

    docs = read_table(spark, sf_dir, "documents")
    images = docs.select(
        F.col("doc_id").alias("item_id"), F.encode(F.col("text"), "utf-8").alias("data")
    )
    # round_to=None: the driver's canonicalizer rounds both engines'
    # doubles identically at 9 dp; an explicit 6-dp round diverges at
    # boundaries (Spark HALF_UP on exact BigDecimal vs DuckDB's scaled
    # double round)
    return photo_quality_score(extract_image_features(images), round_to=None).select(
        "item_id", "width", "height", "format", "n_bytes", "content_hash",
        "brightness", "contrast", "saturation", "quality_score",
    )


@register(
    "p06_frame_sampling",
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
    "p07_audio_windows",
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
