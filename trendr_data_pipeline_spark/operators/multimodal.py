"""Multimodal column operators (north-star requirement).

Images/audio/video are opaque ``binary`` columns plus typed metadata
structs; all processing is Arrow-batched ``mapInPandas`` so bytes
never round-trip through Python row objects one at a time. The
actual codecs (PIL/ffmpeg) are NOT in this image — the decode step is
gated: with a real codec import it would decode; without one it
either raises (strict mode) or produces a deterministic synthetic
decode (test mode) so the batch shapes, schemas and partitioning are
exercised for real.

At 100 TB: binary payloads dominate row size, so operators repartition
by byte budget (``target_batch_bytes``), not row count — an Arrow
batch of ~64 MB keeps executor memory flat regardless of per-file
size skew.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover — not in this image
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

#: schema of a decoded-image feature row — brightness/contrast/
#: saturation carry the reference's RAW 0–255 scales (mean RGB,
#: stddev RGB, mean HSV-S; utils/photo_manager.py:163-199) so the
#: quality curves below apply identically to fake and real decodes
IMAGE_FEATURES_SCHEMA = (
    "item_id long, width int, height int, format string,"
    " n_bytes long, content_hash string, brightness double,"
    " contrast double, saturation double"
)


def estimate_partitions(df: DataFrame, bytes_col: str, target_batch_bytes: int = 64 << 20) -> int:
    """Partition count from total payload bytes — size-aware instead of
    row-count-aware (binary columns make row counts meaningless)."""
    total = df.agg(F.sum(F.length(F.col(bytes_col)))).first()[0] or 0
    return max(1, int(total / target_batch_bytes) + 1)


def _fake_decode(data: bytes) -> tuple[int, int, str, float, float, float]:
    """Deterministic stand-in for a codec: dimensions and pixel stats
    derived from a content hash, on the same raw scales the real
    decoder produces. The real decoder is :func:`_pil_decode` — the
    surrounding plumbing is identical."""
    h = hashlib.sha256(data).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    fmt = ["jpeg", "png", "webp"][h[2] % 3]
    brightness = float(h[3])          # mean RGB, 0–255
    contrast = float(h[4] % 128)      # stddev RGB, 0–~128
    saturation = float(h[5])          # mean HSV-S, 0–255
    return width, height, fmt, brightness, contrast, saturation


def _pil_decode(data: bytes) -> tuple[int, int, str, float, float, float]:
    """Real codec path (reference utils/photo_manager.py:135-199):
    PIL decode, RGB convert; brightness = mean RGB, contrast = mean
    per-channel stddev, saturation = HSV S-channel mean — all raw
    0–255, exactly the reference's ImageStat metrics. Same return
    contract as :func:`_fake_decode` so the mapInPandas plumbing is
    byte-identical between the two."""
    import io

    from PIL import Image, ImageStat

    img = Image.open(io.BytesIO(data))
    fmt = (img.format or "unknown").lower()
    if img.mode != "RGB":
        img = img.convert("RGB")
    stat = ImageStat.Stat(img)
    brightness = sum(stat.mean) / 3.0
    contrast = sum(stat.stddev) / 3.0
    try:
        saturation = ImageStat.Stat(img.convert("HSV")).mean[1]
    except Exception:  # noqa: BLE001 — reference defaults S on HSV failure
        saturation = 0.7 * 255.0
    return img.width, img.height, fmt, brightness, contrast, saturation


def _ppm_decode(data: bytes) -> tuple[int, int, str, float, float, float]:
    """REAL decode path with no external codec: binary PPM (P6,
    maxval 255) parsed from raw bytes — header scan, then pixel stats
    over the actual RGB payload (numpy, float64): brightness = overall
    mean byte (== mean of per-channel means), contrast = mean
    per-channel population stddev, saturation = mean of the HSV
    S-channel computed as 255·(max−min)/max per pixel (0 where
    max = 0; float form — PIL's integer HSV path may differ in the
    last bit, this codec defines its own exact semantics and is
    hash-gated against a DuckDB pixel-enumeration twin in p05).
    Malformed headers/payloads raise ValueError (a decoder must
    reject, not guess)."""
    import re

    import numpy as np

    m = re.match(rb"P6\s+(?:#[^\n]*\s+)*(\d+)\s+(\d+)\s+(\d+)\s", data)
    if not m:
        raise ValueError("not a binary PPM (P6) header")
    width, height, maxval = (int(m.group(i)) for i in (1, 2, 3))
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    px = np.frombuffer(data, dtype=np.uint8, offset=m.end())
    if len(px) < width * height * 3:
        raise ValueError("truncated PPM payload")
    arr = px[: width * height * 3].reshape(height, width, 3).astype(np.float64)
    brightness = float(arr.mean())
    contrast = float(np.mean([arr[:, :, c].std() for c in range(3)]))
    mx = arr.max(axis=2)
    mn = arr.min(axis=2)
    with np.errstate(divide="ignore", invalid="ignore"):
        sat = np.where(mx > 0, (mx - mn) / mx * 255.0, 0.0)
    return width, height, "ppm", brightness, contrast, float(sat.mean())


_CODECS = {"fake": _fake_decode, "pil": _pil_decode, "ppm": _ppm_decode}


def extract_image_features(
    images: DataFrame,
    id_col: str = "item_id",
    data_col: str = "data",
    strict: bool = False,
    codec: str | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """Decode + feature-extract over binary image rows.

    ``codec`` selects the decode step: ``"pil"`` = PIL decoder
    (requires Pillow and valid image bytes), ``"ppm"`` = the built-in
    pure-Python binary-PPM decoder (REAL parsing + pixel stats, no
    external dependency), ``"fake"`` = the deterministic synthetic
    decode. Default: ``"pil"`` when ``strict=True``, else ``"fake"``
    (so tests can assert the full pipeline shape without a codec in
    the image). ``strict=True`` without a real codec raises
    NotImplementedError.

    ``n_partitions`` overrides the byte-budget estimate. Pass it when
    the payload column is COMPUTED (not scanned): ``estimate_partitions``
    materializes the column once just to size batches, which would
    evaluate an upstream payload-building UDF twice."""
    if codec is None:
        codec = "pil" if strict else "fake"
    if codec == "pil" and not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL/Pillow, which is not installed; "
            "use codec='ppm' for the dependency-free real decoder, or "
            "strict=False for the deterministic synthetic decode"
        )
    if codec not in _CODECS:
        raise ValueError(f"unknown codec {codec!r}; valid: {sorted(_CODECS)}")
    decode = _CODECS[codec]
    n_parts = n_partitions if n_partitions is not None else estimate_partitions(images, data_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for item_id, data in zip(pdf[id_col], pdf[data_col]):
                data = bytes(data)
                w, h, fmt, bright, contrast, saturation = decode(data)
                rows.append(
                    (
                        int(item_id),
                        w,
                        h,
                        fmt,
                        len(data),
                        hashlib.sha256(data).hexdigest()[:16],
                        bright,
                        contrast,
                        saturation,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "item_id", "width", "height", "format",
                    "n_bytes", "content_hash", "brightness",
                    "contrast", "saturation",
                ],
            )

    return images.repartition(n_parts).mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


#: photo quality weights (reference utils/photo_manager.py:43-51)
QUALITY_WEIGHTS = {
    "resolution": 0.25,
    "brightness": 0.20,
    "contrast": 0.20,
    "saturation": 0.15,
    "composition": 0.10,
    "file_size": 0.10,
}

#: preferred aspect ratios (reference utils/photo_manager.py:59-64)
ASPECT_RATIOS = [(16, 9), (4, 3), (3, 2), (1, 1)]


def _band_score(raw, lo: float, hi: float, over_div: float, floor: float):
    """The reference's piecewise quality curve: 1.0 inside [lo, hi];
    raw/lo below; max(floor, 1 − (raw−hi)/over_div) above."""
    return (
        F.when((raw >= lo) & (raw <= hi), F.lit(1.0))
        .when(raw < lo, raw / F.lit(lo))
        .otherwise(F.greatest(F.lit(floor), F.lit(1.0) - (raw - F.lit(hi)) / F.lit(over_div)))
    )


def photo_quality_score(features: DataFrame, round_to: int | None = 6) -> DataFrame:
    """A15 weighted quality blend — the reference's exact scoring
    curves (utils/photo_manager.py:157-226) over the raw decoder
    metrics: banded brightness/contrast/saturation, piecewise
    resolution and file-size preferences, and aspect-ratio
    composition. Both decode paths (real PIL / deterministic fake)
    produce the raw-scale columns, so the blend is identical."""
    pixels = (F.col("width") * F.col("height")).cast("double")
    optimal = F.lit(480_000.0)  # 800×600
    res_score = F.when(
        pixels >= optimal, F.least(F.lit(1.0), pixels / (optimal * 2))
    ).otherwise(pixels / optimal)

    bright_score = _band_score(F.col("brightness"), 80.0, 180.0, 75.0, 0.1)
    contrast_score = _band_score(F.col("contrast"), 20.0, 60.0, 40.0, 0.1)
    sat_score = _band_score(F.col("saturation"), 60.0, 200.0, 55.0, 0.3)

    # composition: 1.0 if any preferred ratio within 0.2, else 0.8 if
    # any within 0.5, else the 0.5 default (photo_manager.py:201-213)
    ar = F.col("width").cast("double") / F.col("height")
    diffs = [F.abs(ar - F.lit(w / h)) for w, h in ASPECT_RATIOS]
    any_close = F.greatest(*[(d < 0.2).cast("int") for d in diffs]) == 1
    any_near = F.greatest(*[(d < 0.5).cast("int") for d in diffs]) == 1
    comp_score = F.when(any_close, F.lit(1.0)).when(any_near, F.lit(0.8)).otherwise(F.lit(0.5))

    size = F.col("n_bytes").cast("double")
    size_score = (
        F.when((size >= 50_000) & (size <= 500_000), F.lit(1.0))
        .when(size < 50_000, size / F.lit(50_000.0))
        .otherwise(F.greatest(F.lit(0.3), F.lit(1.0) - (size - F.lit(500_000.0)) / F.lit(1e6)))
    )

    quality = (
        QUALITY_WEIGHTS["resolution"] * res_score
        + QUALITY_WEIGHTS["brightness"] * bright_score
        + QUALITY_WEIGHTS["contrast"] * contrast_score
        + QUALITY_WEIGHTS["saturation"] * sat_score
        + QUALITY_WEIGHTS["composition"] * comp_score
        + QUALITY_WEIGHTS["file_size"] * size_score
    )
    if round_to is not None:
        quality = F.round(quality, round_to)
    return features.withColumn("quality_score", quality)


#: schema of a decoded-audio window row — one row per loudness window
AUDIO_FEATURES_SCHEMA = (
    "item_id long, n_bytes long, sample_rate long, duration_s double,"
    " window_idx int, rms double, is_silent boolean"
)


def extract_audio_features(
    audio: DataFrame,
    id_col: str = "item_id",
    data_col: str = "data",
    rate_col: str = "sample_rate",
    window_s: float = 1.0,
) -> DataFrame:
    """Audio leg of the multimodal trio: bytes → per-window loudness
    rows (1:N mapInPandas — the UDTF shape; batches are byte-budget
    partitioned like the image path). The payload is read as 16-bit
    PCM (duration = n_bytes/2/rate); the per-window RMS decode is the
    gated codec step — without a real codec it is the deterministic
    sha256 fake (digest byte ``window % 32`` scaled to [0, 1]), so the
    whole path stays SQL-twinnable exactly like the image decode.
    ``is_silent`` flags rms < 0.05 (the trim/segment predicate a real
    pipeline filters on)."""
    import math

    spread_df = audio.repartition(
        max(estimate_partitions(audio, data_col), audio.rdd.getNumPartitions())
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[tuple] = []
            for item_id, data, rate in zip(
                pdf[id_col], pdf[data_col], pdf[rate_col], strict=True
            ):
                b = bytes(data)
                n_bytes = len(b)
                duration = (n_bytes // 2) / float(rate)
                digest = hashlib.sha256(b).digest()
                n_win = max(1, math.ceil(duration / window_s))
                for w in range(n_win):
                    rms = digest[w % 32] / 255.0
                    out.append(
                        (item_id, n_bytes, rate, duration, w, rms, rms < 0.05)
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "item_id", "n_bytes", "sample_rate", "duration_s",
                    "window_idx", "rms", "is_silent",
                ],
            )

    return spread_df.mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


def sample_video_frames(
    videos: DataFrame,
    every_n_seconds: float = 5.0,
    id_col: str = "item_id",
    data_col: str = "data",
    duration_col: str = "duration_s",
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp
    (the decode of the actual frame is the gated codec step). The
    explode happens JVM-side from a generated timestamp sequence —
    Python only sees sampled offsets."""
    n = (F.col(duration_col) / every_n_seconds).cast("int")
    ts = F.transform(F.sequence(F.lit(0), n), lambda i: i * every_n_seconds)
    return videos.select(
        F.col(id_col),
        F.length(F.col(data_col)).alias("n_bytes"),
        F.explode(ts).alias("frame_ts"),
    )
