"""Deterministic sampling / data-mixture operators (north-star
LLM-pipeline ops: corpus weighting before training).

Training-data pipelines assemble corpora as WEIGHTED mixtures of
sources (public practice: the per-dataset sampling weights in the
GPT-3 / Llama dataset tables): some sources are downsampled, high
quality ones repeated. The primitive here is a deterministic,
engine-portable keep/repeat decision per row:

- no RNG: the decision is a pure function of (salt, key), so reruns,
  retries and both engines of the driver gate agree row-for-row —
  ``rand()`` would break retry-determinism and be un-oracle-able;
- md5-based: both Spark and DuckDB evaluate the same md5, so the gate
  hash-checks the exact mixture decision;
- scale shape: one codegen'd projection, no shuffle; upsampling
  explodes to ``n_copies`` rows JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_fraction(key: Column, salt: str = "mix") -> Column:
    """Uniform-ish fraction in [0, 1) derived from md5(salt || key) —
    the first 8 hex chars as a uint32 over 2^32. Deterministic and
    identical in DuckDB:
    ``('0x' || substr(md5('<salt>' || CAST(k AS VARCHAR)), 1, 8))::BIGINT
    / 4294967296.0``."""
    h = F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8)
    return F.conv(h, 16, 10).cast("double") / F.lit(4294967296.0)


def mix_n_copies(key: Column, weight: Column, salt: str = "mix") -> Column:
    """How many times this row appears in the mixed corpus for a
    sampling ``weight`` w ≥ 0: ``floor(w)`` guaranteed copies plus one
    more with probability ``frac(w)`` (hash-deterministic). w = 0
    drops, w < 1 downsamples, w > 1 upsamples with the exact expected
    multiplicity E[n] = w.

    A NULL key gets exactly ``floor(w)`` copies (the fractional extra
    is defined 0): this matches the DuckDB twin, where ``NULL || x``
    propagates NULL through the hash and ``CASE WHEN NULL`` takes the
    ELSE branch — without the coalesce, Spark would return NULL
    n_copies and silently drop the row where the twin keeps it."""
    w = weight.cast("double")
    extra = F.coalesce(
        (hash_fraction(key, salt) < (w - F.floor(w))).cast("long"), F.lit(0)
    )
    return (F.floor(w).cast("long") + extra).alias("n_copies")


def apply_mix(
    df: DataFrame,
    weight: Column,
    key_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Materialize the mixture: each row repeated ``mix_n_copies``
    times (0 → dropped). The repeat is a JVM-side
    ``explode(sequence)`` — no Python, no shuffle; downstream shuffles
    see the already-weighted stream."""
    n = mix_n_copies(F.col(key_col), weight, salt)
    return (
        df.withColumn("_n", n)
        .filter(F.col("_n") > 0)
        .withColumn("_i", F.explode(F.sequence(F.lit(1), F.col("_n"))))
        .drop("_n", "_i")
    )
