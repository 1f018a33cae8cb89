"""Quality-classifier inference over hashed n-gram features — the
fastText-style corpus filter (Joulin 2016 ``fastText``; the quality
classifiers of GPT-3 appendix A / CCNet / FineWeb-Edu are this shape:
linear model over hashed bag-of-n-grams, threshold on the score).

Training happens OFFLINE (a model is a few-hundred-KB artifact of
labelled data, fit anywhere); what a 100 TB pipeline needs from the
engine is the INFERENCE pass — score every document with zero shuffle
and no Python in the hot path. The model's weight vector ships as a
1-row broadcast array (the ``decontaminate_bloom`` dense-state
pattern), features are the same hashed n-gram buckets DSIR uses
(:func:`~data_validation_engine_spark.llmops.dsir.ngram_buckets`, so
one per-row projection can feed both importance resampling and quality
scoring), and the score is an ordered left fold over the per-row
feature array — engine-exact when the weights are exactly
representable, which is what puts the logit surface on the oracle
gate.

No reference counterpart (`/root/reference` has no corpus surface).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_validation_engine_spark.llmops.dsir import (
    DEFAULT_BUCKETS,
    ngram_buckets,
)

__all__ = ["classifier_score", "classifier_filter"]


def classifier_score(
    df: DataFrame,
    text_col: str,
    weights: list[float],
    *,
    bias: float = 0.0,
    n_max: int = 2,
    seed: str = "",
    average: bool = True,
    out_col: str = "clf_logit",
    prob_col: str | None = None,
    n_feats_col: str | None = None,
) -> DataFrame:
    """Score every row with a linear bag-of-hashed-n-grams model:
    ``logit = bias + Σ_f w[f]`` over the text's n-gram feature buckets
    (``average=True`` divides by the feature count — the fastText
    mean-pooling form; a zero-feature text scores ``bias`` in both
    forms). ``len(weights)`` IS the bucket count, and must match the
    bucket count the model was trained with.

    ``prob_col`` additionally emits ``sigmoid(logit)`` — transcendental
    (libm), so production-only: threshold on the LOGIT for anything
    hashed or cross-engine (sigmoid is monotone, every probability
    threshold is a logit threshold — :func:`classifier_filter` does the
    conversion).

    Scale shape: the weight vector rides ONE broadcast 1-row array
    (8 bytes × buckets — ~2 MB at 2^18, the documented bounded
    control-plane class), features are a per-row projection, and the
    score is a per-row ordered fold: zero shuffle, zero join rows, no
    Python. The fold order is the feature-array order, so scores are
    deterministic under any partitioning.
    """
    if len(weights) < 2:
        raise ValueError(
            f"weights must have >= 2 entries (the bucket count), got "
            f"{len(weights)}"
        )
    n_buckets = len(weights)
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [([float(w) for w in weights],)], "__clf_w array<double>"
    )
    feats = ngram_buckets(
        F.col(text_col), n_max=n_max, buckets=n_buckets, seed=seed
    )
    total = F.aggregate(
        feats,
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(F.col("__clf_w"), b + F.lit(1)),
    )
    n_feats = F.size(feats)
    logit = F.lit(float(bias)) + F.when(n_feats > 0, total).otherwise(
        F.lit(0.0)
    ) / (
        F.when(n_feats > 0, n_feats).otherwise(F.lit(1))
        if average
        else F.lit(1)
    )
    out = df.crossJoin(F.broadcast(wdf)).withColumn(out_col, logit)
    if prob_col is not None:
        out = out.withColumn(
            prob_col,
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col(out_col))),
        )
    if n_feats_col is not None:
        out = out.withColumn(n_feats_col, n_feats)
    return out.drop("__clf_w")


def classifier_filter(
    df: DataFrame,
    text_col: str,
    weights: list[float],
    *,
    bias: float = 0.0,
    n_max: int = 2,
    seed: str = "",
    average: bool = True,
    threshold_prob: float = 0.5,
    keep_col: str | None = None,
    score_col: str = "clf_logit",
) -> DataFrame:
    """Keep rows the classifier scores at or above ``threshold_prob``.

    The comparison happens in LOGIT space — ``threshold_prob`` is
    converted once on the driver (``ln(p/(1-p))``, plain Python math),
    so the distributed plan never evaluates a sigmoid: same decisions,
    no transcendental in the hot path. ``keep_col`` flags instead of
    filtering (audit mode, the ``select_token_budget`` convention);
    the logit stays in ``score_col`` either way.
    """
    if not 0.0 < threshold_prob < 1.0:
        raise ValueError(
            f"threshold_prob must be in (0, 1), got {threshold_prob}"
        )
    cut = math.log(threshold_prob / (1.0 - threshold_prob))
    scored = classifier_score(
        df, text_col, weights,
        bias=bias, n_max=n_max, seed=seed, average=average,
        out_col=score_col,
    )
    decision = F.col(score_col) >= F.lit(cut)
    if keep_col is not None:
        return scored.withColumn(keep_col, decision)
    return scored.where(decision)


# re-exported so classifier users can size feature spaces consistently
# with the DSIR side of the pipeline
DEFAULT_CLASSIFIER_BUCKETS = DEFAULT_BUCKETS
