"""Persisted trained-model artifacts (r12 verdict item 5).

The ANN indexes got the full artifact lifecycle in r9-r11 (⊕M5/M8/M9:
temp-dir + atomic-rename swap, crash healing, warm-read bit-parity);
the two pyspark.ml model legs — the x16 quality classifier and the
zt02 language-ID model — retrained on every call. This module gives
them the same save → load → byte-identical-scores contract through
the SAME swap discipline (:func:`index_store._atomic_write` /
``_reader_root`` — one copy of the crash protocol, not a fork):

- **quality** (:mod:`quality_model`): the artifact is the extracted
  parameter dict (coef/intercept/mean/std) as JSON under ``meta/`` —
  four float vectors, exact under JSON round-trip (repr-based float
  encoding), scored through the same whole-stage-codegen expressions,
  so warm == cold to the last bit.
- **langid** (:mod:`langid_model`): the artifact is the multinomial
  ``LogisticRegressionModel`` via Spark ML's own writer (parquet
  coefficient matrix — exact), staged into the swap's temp dir; a
  ``meta/kind.json`` marker makes the artifact self-describing and
  lets ``_reader_root`` resolve the swap window.

At 100 TB the fit is a many-pass L-BFGS job over the corpus while
scoring is one projection — persisting the model is what makes the
release cycle's incremental story (c38/c44) apply to model-gated
filtering too: refresh scores on the delta without refitting.
tests/test_model_store.py pins warm == cold byte-exact for both legs
plus overwrite-in-place.
"""

from __future__ import annotations

import json
import os

from .index_store import _atomic_write, _reader_root

_QUALITY_KIND = "quality_lr_params_v1"
_LANGID_KIND = "langid_lr_model_v1"


def save_quality_params(params: dict, out_dir: str) -> None:
    """Persist the extracted quality-model parameters atomically."""

    def parts(tmp: str) -> None:
        os.makedirs(os.path.join(tmp, "meta"))
        with open(os.path.join(tmp, "meta", "params.json"), "w") as f:
            json.dump({"kind": _QUALITY_KIND, **params}, f)

    _atomic_write(out_dir, parts)


def load_quality_params(out_dir: str) -> dict:
    """Read the parameter dict back (reader-safe during a writer's
    swap window via ``_reader_root``; never mutates)."""
    root = _reader_root(out_dir)
    with open(os.path.join(root, "meta", "params.json")) as f:
        loaded = json.load(f)
    if loaded.pop("kind", None) != _QUALITY_KIND:
        raise ValueError(f"{out_dir}: not a {_QUALITY_KIND} artifact")
    return loaded


def save_langid_model(model, out_dir: str) -> None:
    """Persist a fitted LogisticRegressionModel atomically (Spark
    ML's writer runs INSIDE the temp dir, so a crash mid-write never
    leaves a torn visible artifact)."""

    def parts(tmp: str) -> None:
        model.write().overwrite().save(os.path.join(tmp, "model"))
        os.makedirs(os.path.join(tmp, "meta"))
        with open(os.path.join(tmp, "meta", "kind.json"), "w") as f:
            json.dump({"kind": _LANGID_KIND, "num_classes": model.numClasses}, f)

    _atomic_write(out_dir, parts)


def load_langid_model(out_dir: str):
    from pyspark.ml.classification import LogisticRegressionModel

    root = _reader_root(out_dir)
    with open(os.path.join(root, "meta", "kind.json")) as f:
        meta = json.load(f)
    if meta.get("kind") != _LANGID_KIND:
        raise ValueError(f"{out_dir}: not a {_LANGID_KIND} artifact")
    return LogisticRegressionModel.load(os.path.join(root, "model"))
