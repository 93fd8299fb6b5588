"""Trained language-ID twin of the t02 marker heuristic (⊕T2's
trained leg — r11 verdict item 6; production practice: fastText
langid, a linear model over hashed char-n-gram counts).

Why a planted corpus: the fixture's ``lang`` column is UNCORRELATED
with its text (its 'zh' docs contain zero CJK characters; 'de' docs
carry 'der/und' at the same rate as 'en' docs — measured r12), so a
model trained on that label can only learn noise, and the t02
heuristic itself collapses to en/unknown on the fixture (453/47 at
sf0.01). A held-out-accuracy pin needs text where the language signal
EXISTS, so the c51/c55 synthetic device applies: plant a corpus from
``doc_id`` arithmetic where each doc carries THREE markers of its
true language (``doc_id % 5``) and ONE decoy marker of another
language (``(doc_id * 3 + 1) % 5``), between md5-filler tokens. The
decoy makes the task count-weighted rather than presence-trivial —
a model that only detects "contains 'der'" mislabels every decoy doc;
the marker-argmax heuristic still recovers the true language (3 > 1)
so heuristic agreement is a meaningful second pin.

Spark-first shape (the x16 posture): char-bigram extraction and
label/split derivation are pure JVM expressions over the scan;
``HashingTF`` (murmur, JVM) buckets the bigrams; multinomial
``pyspark.ml`` LogisticRegression fits by distributed L-BFGS — the
idiomatic way to fit a linear model at 100 TB; scoring is the fitted
model's one projection. No Python row functions anywhere.

Rows-only under the driver gate (iterative optimization has no SQL
twin — the x15/x16 posture); tests/test_text_functions.py pins
held-out accuracy ≥ 0.9 vs the planted truth AND held-out agreement
≥ 0.9 with the t02 heuristic on the same corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: one marker token per language, drawn from t02's marker lists
#: (plans/text_ops._MARKERS) — index aligned with ``doc_id % 5``
LANGS = ["en", "fr", "de", "es", "zh"]
_PLANT = {"en": "the", "fr": "le", "de": "der", "es": "los", "zh": "的"}

_DIM = 256  #: hashed char-bigram buckets (fastText-scale would be 2^20)


def planted_lang_text(doc_id: Column) -> Column:
    """Deterministic language-marked body for ``doc_id``: md5 filler,
    three true-language markers, one decoy marker of a DIFFERENT
    language ((id*3 + 1) % 5 ≠ id % 5 because 2id+1 ≢ 0 (mod 5) has
    solutions — where it IS the same language the doc simply carries
    four true markers, which changes nothing for either learner)."""
    d = doc_id.cast("long")

    def w(j: int) -> Column:
        return F.concat(
            F.lit("w"),
            F.substring(
                F.md5(F.concat(F.lit("lid"), d.cast("string"), F.lit(f"-{j}"))), 1, 5
            ),
        )

    lang_arr = F.array(*[F.lit(_PLANT[lg]) for lg in LANGS])
    true_m = F.element_at(lang_arr, (d % 5 + 1).cast("int"))
    decoy_m = F.element_at(lang_arr, ((d * 3 + 1) % 5 + 1).cast("int"))
    return F.concat_ws(
        " ", w(0), true_m, w(1), decoy_m, true_m, w(2), true_m, w(3)
    )


def char_bigrams(text: Column) -> Column:
    """All character bigrams of the lowercased text — a JVM
    ``transform(sequence(...))``, no Python."""
    t = F.lower(text)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - 1, F.lit(1))),
        lambda i: F.substring(t, i, F.lit(2)),
    )


def langid_feature_frame(
    docs: DataFrame,
    train_frac: float = 0.8,
    salt: str = "lidsplit",
) -> DataFrame:
    """The deterministic planted-corpus feature frame (hashed bigram
    vectors + truth/heuristic labels + split flag) both the fit and
    the scoring pass read — split out (r12 verdict item 5) so a warm
    process can rebuild it and score with a PERSISTED model."""
    from pyspark.ml.feature import HashingTF

    from ..plans.text_ops import lang_hit_columns, predicted_lang_expr, tokens
    from .sampling import hash_fraction

    d = F.col("doc_id").cast("long")
    planted = docs.select(
        "doc_id", planted_lang_text(F.col("doc_id")).alias("text")
    )
    lang_arr = F.array(*[F.lit(lg) for lg in LANGS])
    heur = lang_hit_columns(
        planted.select(
            "doc_id",
            "text",
            tokens(F.lower(F.col("text"))).alias("toks"),
        )
    ).select(
        "doc_id",
        "text",
        predicted_lang_expr().alias("lang_heur"),
    )
    base = heur.select(
        "doc_id",
        "lang_heur",
        F.element_at(lang_arr, (d % 5 + 1).cast("int")).alias("lang_true"),
        (d % 5).cast("double").alias("label"),
        (hash_fraction(F.col("doc_id"), salt) < train_frac).alias("is_train"),
        char_bigrams(F.col("text")).alias("_grams"),
    )
    tf = HashingTF(inputCol="_grams", outputCol="features", numFeatures=_DIM)
    feat = tf.transform(base)
    # one materialization feeds every L-BFGS pass and the scoring
    # projection (the quality_model posture; ContextCleaner reclaims
    # the checkpoint with the returned frame)
    from ..plan_debug import note_subtree

    return note_subtree("langid.features", feat).localCheckpoint(eager=True)


def fit_langid_model(feat: DataFrame):
    """Multinomial L-BFGS over the train split; returns the fitted
    ``LogisticRegressionModel`` (MLWritable — :mod:`model_store`
    persists it through the atomic-swap artifact lifecycle)."""
    from pyspark.ml.classification import LogisticRegression

    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        family="multinomial",
        maxIter=40,
        regParam=1e-4,
        standardization=True,
    )
    return lr.fit(feat.filter(F.col("is_train")))


def score_langid(feat: DataFrame, model) -> DataFrame:
    """Apply a (fitted or loaded) model to the feature frame —
    deterministic given the model's coefficient matrix, so warm ==
    cold byte-exact (pinned by tests/test_model_store.py)."""
    lang_arr = F.array(*[F.lit(lg) for lg in LANGS])
    scored = model.transform(feat)
    return scored.select(
        "doc_id",
        "lang_true",
        "lang_heur",
        F.element_at(lang_arr, F.col("prediction").cast("int") + 1).alias("lang_pred"),
        "is_train",
    )


def train_and_score_langid(
    docs: DataFrame,
    train_frac: float = 0.8,
    salt: str = "lidsplit",
) -> DataFrame:
    """Plant the corpus, fit multinomial LR on the deterministic hash
    split, score every doc. Returns (doc_id, lang_true, lang_heur,
    lang_pred, is_train) at doc grain."""
    feat = langid_feature_frame(docs, train_frac=train_frac, salt=salt)
    return score_langid(feat, fit_langid_model(feat))
