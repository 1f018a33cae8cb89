"""Character n-gram language-model scoring (CCNet-style quality filter).

The strongest public web-corpus quality signal after rule heuristics is
LM perplexity against a clean reference corpus (Wenzek et al. 2020 CCNet
§3.3: score every paragraph with a KenLM model trained on Wikipedia,
keep the low-perplexity head). This module implements the Spark-native
version with an add-alpha-smoothed character n-gram model — deliberately
simple (no Kneser-Ney backoff) so the model is a plain DataFrame and
training is ONE aggregation; the ranking behaviour (gibberish and
boilerplate score high, fluent text scores low) is what the filter
needs, not SOTA language modelling.

Scale shape: training is one shuffle keyed by the n-gram (map-side
combined counts); scoring explodes docs into (doc, gram) rows and joins
the model — the model table is charset^n-bounded (a few hundred
thousand rows for char trigrams), so Spark broadcasts it and the score
is one doc-keyed aggregation. Log-probabilities are transcendental:
score columns are for FILTERING (threshold comparisons), not for
hashed engine-exact surfaces (FLOATS.md discipline).

No reference counterpart (`/root/reference` has no corpus surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["char_ngram_counts", "train_char_lm", "perplexity_score"]


def _grams(text: Column, n: int) -> Column:
    """All character n-grams of ``lower(text)`` with runs of whitespace
    collapsed to one space — per-row expression, zero shuffle."""
    t = F.lower(F.regexp_replace(text, r"\s+", " "))
    length = F.length(t)
    return F.when(
        length >= n,
        F.transform(
            F.sequence(F.lit(1), length - n + 1),
            lambda i: F.substring(t, i, n),
        ),
    ).otherwise(F.array())


def char_ngram_counts(
    df: DataFrame, text_col: str, *, n: int = 3
) -> DataFrame:
    """Corpus n-gram counts ``(gram, cnt)`` — one hash aggregation."""
    return (
        df.select(F.explode(_grams(F.col(text_col), n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_char_lm(
    df: DataFrame, text_col: str, *, n: int = 3
) -> tuple[DataFrame, int, int]:
    """Train on a reference corpus: returns ``(model, total, vocab)``
    where ``model`` is the count table and ``total``/``vocab`` the two
    scalars add-alpha smoothing needs. The two scalars are the only
    driver traffic; the count table stays distributed (and is the thing
    to persist for reuse across scoring runs)."""
    model = char_ngram_counts(df, text_col, n=n)
    row = model.agg(
        F.sum("cnt").alias("t"), F.count(F.lit(1)).alias("v")
    ).first()
    if row["t"] is None:
        raise ValueError("train_char_lm: reference corpus has no n-grams")
    return model, int(row["t"]), int(row["v"])


def perplexity_score(
    df: DataFrame,
    model: DataFrame,
    total: int,
    vocab: int,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    alpha: float = 1.0,
    round_to: int = 6,
) -> DataFrame:
    """Per-document perplexity under the smoothed model: ``id_col,
    n_grams, logprob_avg, perplexity``. P(g) = (cnt+α)/(total+α·(V+1))
    — unseen grams share the α mass (the +1 virtual unseen type keeps
    probabilities proper). Lower perplexity = more like the reference
    corpus; gate with ``perplexity <= threshold``.

    Plan: doc-gram explode → broadcast-or-shuffle join against the
    model → ONE doc-keyed aggregation. Docs shorter than ``n`` chars
    get NULL scores (no grams to judge — let the caller's length gate
    handle them, not a fake number).
    """
    denom = float(total) + alpha * float(vocab + 1)
    grams = df.select(
        F.col(id_col),
        F.explode(_grams(F.col(text_col), n)).alias("gram"),
    )
    scored = grams.join(F.broadcast(model), "gram", "left").select(
        F.col(id_col),
        F.log(
            (F.coalesce(F.col("cnt"), F.lit(0)).cast("double") + alpha)
            / F.lit(denom)
        ).alias("__lp"),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.round(F.avg("__lp"), round_to).alias("logprob_avg"),
        F.round(F.exp(-F.avg("__lp")), round_to).alias("perplexity"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .withColumn("n_grams", F.coalesce(F.col("n_grams"), F.lit(0)))
    )
