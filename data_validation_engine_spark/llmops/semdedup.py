"""SemDeDup: semantic deduplication via cluster-then-cosine (Abbas et
al. 2023, arXiv:2303.09540).

Document-level exact/MinHash dedup misses *semantic* duplicates —
paraphrases, translations-of-templates, near-identical boilerplate with
token-level noise. The published recipe: k-means the embedding space,
compute pairwise cosine WITHIN each cluster only, and keep one document
per semantic-duplicate group. Cross-cluster near-dups are deliberately
out of scope (the paper's own tradeoff: the clustering IS the blocking
step that makes the O(n²) pair space tractable).

Everything composes from parts already proven engine-exact:

- clustering = :func:`~.vectors.kmeans_fit` (deterministic Lloyd's,
  ordered folds) + :func:`~.ivf.ivf_assign` (map-side argmin);
- candidate pairs = :func:`~.pairs.bounded_self_join` keyed by the
  cluster cell, so one hot cluster decomposes into bounded blocks
  instead of going quadratic in one task;
- duplicate groups = :func:`~.dedup.connected_components` (min-label);
- survivorship = lowest id per group (deterministic; callers wanting
  quality-weighted survivors feed the groups to
  :func:`~.dedup.cluster_representatives`).

Scale shape at 100 TB: the corpus shuffles once keyed by cell (the
self-join), the pair graph — far smaller than the corpus — drives CC,
and the final keep-filter is a broadcast-or-shuffle semi/anti join on
ids. Driver traffic is the k×dim centroid table per k-means round only.
No reference counterpart (`/root/reference` has no embedding surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_validation_engine_spark.llmops.dedup import connected_components
from data_validation_engine_spark.llmops.pairs import (
    DEFAULT_MAX_BUCKET_ROWS,
    bounded_self_join,
)
from data_validation_engine_spark.llmops.similarity import dot_col, norm_col

__all__ = ["semantic_pairs", "semantic_dup_groups", "semantic_dedup"]


def semantic_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    n_cells: int = 8,
    threshold: float = 0.95,
    n_iters: int = 2,
    round_to: int = 6,
    max_bucket_rows: int = DEFAULT_MAX_BUCKET_ROWS,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Within-cluster cosine pairs ``(id_a, id_b, cosine)``, id_a < id_b,
    cosine >= ``threshold``. Pass precomputed ``centroids`` to skip the
    k-means fit (e.g. a sample-fitted or previously persisted model)."""
    from data_validation_engine_spark.llmops.ivf import ivf_assign
    from data_validation_engine_spark.llmops.vectors import kmeans_fit

    narrow = df.select(id_col, vec_col)
    if centroids is None:
        centroids = kmeans_fit(
            narrow, n_cells, id_col=id_col, vec_col=vec_col,
            dim=dim, n_iters=n_iters, round_to=round_to,
        )
    assigned = ivf_assign(narrow, centroids, vec_col=vec_col).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("cell"),
        norm_col(F.col(vec_col)).alias("__norm"),
    )
    return (
        bounded_self_join(
            assigned,
            ["cell"],
            order_col=id_col,
            max_bucket_rows=max_bucket_rows,
        )
        .select(
            F.col(f"a.`{id_col}`").alias("id_a"),
            F.col(f"b.`{id_col}`").alias("id_b"),
            F.round(
                dot_col(F.col(f"a.`{vec_col}`"), F.col(f"b.`{vec_col}`"))
                / (F.col("a.`__norm`") * F.col("b.`__norm`")),
                round_to,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def semantic_dup_groups(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    n_cells: int = 8,
    threshold: float = 0.95,
    n_iters: int = 2,
    round_to: int = 6,
    max_bucket_rows: int = DEFAULT_MAX_BUCKET_ROWS,
    centroids: list[list[float]] | None = None,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Duplicate-group table ``(id, group)`` — one row per document that
    participates in at least one semantic near-dup pair; ``group`` is the
    smallest id reachable through the pair graph (so the group's
    canonical representative is the row with ``id == group``).

    Pass ``pairs`` (a :func:`semantic_pairs` result, ideally persisted /
    localCheckpointed) to skip recomputing the pair pipeline — the
    clustering + within-cell cosine pass is the expensive stage, and a
    caller that wants pairs AND groups AND the keep-set should run it
    exactly once."""
    if pairs is None:
        pairs = semantic_pairs(
            df, id_col=id_col, vec_col=vec_col, dim=dim, n_cells=n_cells,
            threshold=threshold, n_iters=n_iters, round_to=round_to,
            max_bucket_rows=max_bucket_rows, centroids=centroids,
        )
    return connected_components(pairs).select(
        F.col("id").alias(id_col), F.col("component").alias("group")
    )


def semantic_dedup(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    n_cells: int = 8,
    threshold: float = 0.95,
    n_iters: int = 2,
    round_to: int = 6,
    max_bucket_rows: int = DEFAULT_MAX_BUCKET_ROWS,
    centroids: list[list[float]] | None = None,
    groups: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup keep-set: ``df``'s rows minus semantic duplicates.

    A row survives iff it is in no near-dup pair, or it is its group's
    representative (the minimum id — CC's component label, so the
    survivor needs no extra aggregation). Output schema = input schema
    + ``sem_group`` (the group label for surviving representatives,
    NULL for rows that were never duplicated).

    The drop is an anti-join of ``df`` against the non-representative
    group members — group-table-sized, not corpus-sized, so Spark
    broadcasts it whenever the duplicate population fits.

    Pass ``groups`` (a :func:`semantic_dup_groups` result) to skip
    recomputing the pair pipeline + CC — same reuse contract as
    ``semantic_dup_groups(pairs=...)``.
    """
    if groups is None:
        groups = semantic_dup_groups(
            df, id_col=id_col, vec_col=vec_col, dim=dim, n_cells=n_cells,
            threshold=threshold, n_iters=n_iters, round_to=round_to,
            max_bucket_rows=max_bucket_rows, centroids=centroids,
        )
    reps = groups.where(F.col(id_col) == F.col("group"))
    losers = groups.where(F.col(id_col) != F.col("group")).select(id_col)
    return (
        df.join(losers, id_col, "left_anti")
        .join(reps, id_col, "left")
        .withColumnRenamed("group", "sem_group")
    )
