"""Benchmark decontamination: flag corpus documents that share word
n-grams with an evaluation/benchmark set.

The standard pre-training hygiene pass (public method: exact n-gram
overlap, as in GPT-3 appendix C / PaLM / Llama decontamination): a
document is contaminated if any of its word n-grams also appears in the
benchmark. No reference counterpart — the reference has no corpus
surface; this is part of the engine's training-data vocabulary.

Scale shape: the benchmark is the small side by construction (eval sets
are thousands of documents, the corpus is billions), so its distinct
n-gram set is broadcast and the corpus side never shuffles for the
match itself — explode, broadcast-hash semi-join, then one map-side-
combining count keyed by the doc id. Corpus text is scanned once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_validation_engine_spark.llmops.dedup import shingles_col

DEFAULT_NGRAM = 5


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    *,
    ngram: int = DEFAULT_NGRAM,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Flag corpus docs sharing any word ``ngram``-gram with ``benchmark``.

    Returns one row per corpus document: ``(id, n_hits, contaminated)``
    where ``n_hits`` counts the document's DISTINCT n-grams that appear in
    the benchmark (shingles are distinct per doc, matching
    :func:`~data_validation_engine_spark.llmops.dedup.shingles_col`, so a
    doc repeating one leaked n-gram ten times counts it once). Documents
    shorter than ``ngram`` words contribute their whole text as the single
    gram — a short doc exactly equal to benchmark text still flags.

    ``broadcast_benchmark=False`` falls back to a shuffle hash join for
    the (unusual) case of a benchmark too large to broadcast.

    The match joins on ``md5(gram)`` rather than the raw n-gram string:
    the broadcast side is 32 hex bytes per distinct benchmark n-gram
    regardless of n-gram length, and md5-equality is gram-equality for
    the oracle's purposes (identical deterministic hash both engines).
    """
    grams = F.transform(
        shingles_col(F.col(text_col), ngram), lambda g: F.md5(g)
    )
    bench_grams = (
        benchmark.select(F.explode(grams).alias("__gram")).distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(grams).alias("__gram")
    )
    hits = (
        corpus_grams.join(bench_grams, "__gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )
