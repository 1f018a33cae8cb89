"""Reciprocal Rank Fusion: combine ranked retrieval lists without
score calibration (Cormack, Clarke & Buettcher 2009, "Reciprocal rank
fusion outperforms Condorcet and individual rank learning methods").

The hybrid-retrieval problem: BM25 scores and embedding cosines live
on incomparable scales, so summing or max-ing raw scores is
meaningless. RRF ranks each list independently and fuses on RANK
alone: ``score(d) = sum over lists of 1 / (k + rank_d)`` with ``k≈60``
— robust, parameter-light, and the standard first fusion every hybrid
search stack reaches for (Elasticsearch/OpenSearch ship exactly this).

Engine-exact formulation: this implementation computes the
contribution as the INTEGER ``scale // (k + rank)`` (``scale=10^12``)
and sums longs — order-free, bit-identical on any engine, and
monotonically equivalent to the float form down to quantization ~1e-12
(two documents tie only if every per-list contribution ties, where the
float form ties too). Floats never enter the operator, so fused
rankings are oracle-attestable outright, unlike the float-threshold
surfaces (FLOATS.md).

Scale shape: one union of (query, doc, rank) triples — ranks, not
scores, not vectors — then a single groupBy(query, doc) with map-side
combine, then per-query WindowGroupLimit for the cut. At 100 TB the
candidate lists are already top-k-bounded per query, so the fused
table is at most ``n_lists * k`` rows per query regardless of corpus
size.

The reference engine has no retrieval surface; net-new extension per
SURVEY §8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_K = 60
DEFAULT_SCALE = 10**12


def rank_by_score(
    df: DataFrame,
    score_col: str,
    *,
    query_cols: list[str] | None = None,
    doc_col: str = "doc_id",
    descending: bool = True,
    rank_col: str = "rank",
) -> DataFrame:
    """Dense 1-based ranks from a score column, per query group —
    ties broken on ascending doc id so the rank (and therefore the
    fused score) is deterministic even where the float scores tie."""
    groups = list(query_cols or [])
    order = [
        F.col(score_col).desc() if descending else F.col(score_col).asc(),
        F.col(doc_col).asc(),
    ]
    w = Window.partitionBy(*groups).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w))


def rrf_fuse(
    results: list[DataFrame],
    *,
    query_cols: list[str] | None = None,
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = DEFAULT_K,
    scale: int = DEFAULT_SCALE,
    top_n: int | None = None,
) -> DataFrame:
    """Fuse ranked lists into ``query_cols + (doc, n_lists, best_rank,
    rrf_score)``, ``rrf_score`` descending per query (``top_n`` keeps
    the per-query head via WindowGroupLimit).

    Each input needs ``query_cols + (doc_col, rank_col)`` with 1-based
    ranks (:func:`rank_by_score` builds them from scores); extra
    columns are dropped. A document absent from a list simply
    contributes nothing for it — the standard RRF convention.
    """
    if not results:
        raise ValueError("need at least one ranked list")
    if k < 0:
        raise ValueError("k must be >= 0")
    if scale <= 0:
        raise ValueError("scale must be positive")
    groups = list(query_cols or [])
    cols = [*groups, doc_col, rank_col]
    unioned = results[0].select(*cols)
    for r in results[1:]:
        unioned = unioned.unionByName(r.select(*cols))
    guarded = unioned.withColumn(
        rank_col,
        F.when(F.col(rank_col) >= 1, F.col(rank_col).cast("long")).otherwise(
            F.raise_error(
                F.lit("rrf_fuse: ranks must be 1-based positive integers")
            )
        ),
    )
    # true integer division (SQL DIV), NOT floor(a / b): long division
    # through a double is correctly rounded, so a quotient lying within
    # 1 ulp below an integer can round UP and floor() one too high —
    # DIV matches DuckDB's // exactly on every input
    contrib = F.expr(
        f"CAST({int(scale)} AS BIGINT) DIV "
        f"(CAST({int(k)} AS BIGINT) + `{rank_col}`)"
    )
    fused = (
        guarded.withColumn("__c", contrib)
        .groupBy(*groups, doc_col)
        .agg(
            F.count(F.lit(1)).alias("n_lists"),
            F.min(rank_col).alias("best_rank"),
            F.sum("__c").alias("rrf_score"),
        )
    )
    if top_n is not None:
        if top_n <= 0:
            raise ValueError("top_n must be positive")
        w = Window.partitionBy(*groups).orderBy(
            F.col("rrf_score").desc(), F.col(doc_col).asc()
        )
        fused = (
            fused.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= top_n)
            .drop("__rn")
        )
    return fused
