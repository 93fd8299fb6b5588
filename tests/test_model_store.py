"""Persist/reload parity for the trained-model legs (r12 verdict
item 5): save → load → IDENTICAL scores, byte-exact, through the
index_store swap discipline. The cold path fits; the warm path only
rebuilds the deterministic feature frame and scores with the loaded
artifact — the 100 TB serve shape (scoring is one projection; the
L-BFGS fit is the expensive part worth persisting)."""

from __future__ import annotations

from tests.conftest import SMOKE_SF


def _docs(spark):
    from trendr_data_pipeline_spark.io import read_table

    return read_table(spark, SMOKE_SF, "documents")


def test_quality_params_roundtrip_and_warm_scores_exact(spark, tmp_path):
    from trendr_data_pipeline_spark.operators.model_store import (
        load_quality_params,
        save_quality_params,
    )
    from trendr_data_pipeline_spark.operators.quality_model import (
        fit_quality_params,
        labeled_quality_frame,
        score_quality,
    )

    docs = _docs(spark)
    labeled = labeled_quality_frame(docs)
    params = fit_quality_params(labeled)
    out = str(tmp_path / "qmodel")
    save_quality_params(params, out)

    loaded = load_quality_params(out)
    assert loaded == params  # JSON float round-trip is exact

    cold = sorted(tuple(r) for r in score_quality(labeled, params).collect())
    # warm process posture: rebuild the frame from scratch, score with
    # the LOADED params only
    warm_frame = labeled_quality_frame(docs)
    warm = sorted(tuple(r) for r in score_quality(warm_frame, loaded).collect())
    assert warm == cold  # byte-exact, probs included


def test_quality_params_overwrite_atomic(spark, tmp_path):
    from trendr_data_pipeline_spark.operators.model_store import (
        load_quality_params,
        save_quality_params,
    )

    out = str(tmp_path / "qmodel")
    save_quality_params({"coef": [1.0], "intercept": 0.5, "mean": [0.0], "std": [1.0]}, out)
    save_quality_params({"coef": [2.0], "intercept": -0.5, "mean": [0.1], "std": [2.0]}, out)
    assert load_quality_params(out)["coef"] == [2.0]


def test_langid_model_roundtrip_and_warm_scores_exact(spark, tmp_path):
    from trendr_data_pipeline_spark.operators.langid_model import (
        fit_langid_model,
        langid_feature_frame,
        score_langid,
    )
    from trendr_data_pipeline_spark.operators.model_store import (
        load_langid_model,
        save_langid_model,
    )

    docs = _docs(spark)
    feat = langid_feature_frame(docs)
    model = fit_langid_model(feat)
    out = str(tmp_path / "lidmodel")
    save_langid_model(model, out)

    loaded = load_langid_model(out)
    cold = sorted(tuple(r) for r in score_langid(feat, model).collect())
    warm_frame = langid_feature_frame(docs)
    warm = sorted(tuple(r) for r in score_langid(warm_frame, loaded).collect())
    assert warm == cold


def test_model_store_rejects_wrong_kind(spark, tmp_path):
    import pytest

    from trendr_data_pipeline_spark.operators.model_store import (
        load_langid_model,
        load_quality_params,
        save_quality_params,
    )

    out = str(tmp_path / "qmodel")
    save_quality_params({"coef": [1.0], "intercept": 0.0, "mean": [0.0], "std": [1.0]}, out)
    with pytest.raises((ValueError, FileNotFoundError)):
        load_langid_model(out)
    # and a healthy artifact loads under its own kind
    assert load_quality_params(out)["intercept"] == 0.0
