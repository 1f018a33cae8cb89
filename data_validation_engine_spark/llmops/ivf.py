"""IVF (inverted-file) ANN: coarse quantization into cells, probe the
nearest ``n_probe`` cells only.

The third similarity-search path next to brute force (`cosine_topk`) and
hyperplane LSH (`ann_topk` / `multiprobe_ann_topk`): vectors are assigned
to the nearest of K centroids (one per-row expression — NO shuffle, no
training job), a probe scores only the cells nearest the query, so the
scanned fraction is ~n_probe/K with recall controlled by n_probe.

Centroid strategy: deterministic by construction — the first ``n_cells``
vectors in id order (or any caller-provided list, e.g. offline k-means
output). Deterministic centroids are what make the assignment exactly
reproducible across engines (the DuckDB oracle embeds them as literals);
production users plug trained centroids into the same operator. At 100 TB
the assignment is a map-side projection against K broadcast literals and
the probe filter is an ``IN`` on a small integer column — pushable to the
scan, partition-prunable if the table is written partitioned by cell.

All arithmetic is double left-folds in index order (squared-L2 for
assignment, cosine for ranking) — bit-identical to the oracle's
``list_reduce`` folds. Cell ties break on the lower cell id via
lexicographic struct ordering, the same rule the oracle's ``min(ROW(d,
cell))`` applies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_validation_engine_spark.llmops.similarity import (
    _as_double,
    cosine_col,
    dlit_array,
    dlit_matrix,
)


def l2sq_col(a: Column, b: Column) -> Column:
    """Squared L2 distance, double left-fold in index order."""
    return F.aggregate(
        F.zip_with(
            _as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def default_centroids(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
) -> list[list[float]]:
    """First ``n_cells`` vectors in id order — the deterministic
    placeholder quantizer (swap in offline k-means output for recall)."""
    rows = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .collect()
    )
    return [[float(x) for x in r[vec_col]] for r in rows]


def _cell_col(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid cell id as one per-row expression (no shuffle):
    array of (distance, cell) structs -> array_min -> lexicographic min
    picks the smallest distance, lower cell id on ties.

    r13 optimization (guide §1.2 per-task work, measured): the
    centroid grid rides as ONE nested-array literal traversed by a
    ``transform`` lambda, instead of K independently-planned
    ``l2sq(vec, lit_k)`` subtrees — the arithmetic per (row, centroid)
    is the identical index-order fold, but the analyzed plan shrinks
    ~K-fold (Catalyst analysis of the K-subtree form dominated the
    operator's wall clock at bench scale: pq_encode 4.9s -> 0.6s on
    2000 rows)."""
    cent_lit = dlit_matrix(centroids)
    return F.array_min(
        F.transform(
            cent_lit,
            lambda c, i: F.struct(
                l2sq_col(vec, c).alias("d"), i.alias("cell")
            ),
        )
    ).getField("cell")


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    *,
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Attach the IVF cell id to every row (map-side only)."""
    return df.withColumn(cell_col, _cell_col(F.col(vec_col), centroids))


def ivf_topk(
    df: DataFrame,
    query: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    n_cells: int = 16,
    n_probe: int = 4,
    exclude_self: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Top-k by cosine among the ``n_probe`` cells nearest the query.

    The query row is driver data by definition (1-row collect, the same
    class of probe as the LSH path); its cell shortlist becomes a static
    ``IN`` filter on the integer cell column, then the exact cosine ranks
    the surviving ~n_probe/K of the table.
    """
    if centroids is None:
        centroids = default_centroids(
            df, id_col=id_col, vec_col=vec_col, n_cells=n_cells
        )
    qrows = query.select(
        F.col(vec_col).alias("__qvec"), F.col(id_col).alias("__qid")
    ).collect()
    if len(qrows) != 1:
        raise ValueError(f"query must be exactly one row, got {len(qrows)}")
    qvec = [float(x) for x in qrows[0]["__qvec"]]
    qid = qrows[0]["__qid"]

    def l2sq(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    ranked = sorted(
        ((l2sq(qvec, c), i) for i, c in enumerate(centroids))
    )
    probe_cells = [i for _, i in ranked[: max(1, n_probe)]]

    qlit = dlit_array(qvec)
    assigned = ivf_assign(df, centroids, vec_col=vec_col)
    scored = assigned.where(F.col("cell").isin(probe_cells)).select(
        F.col(id_col),
        F.round(cosine_col(F.col(vec_col), qlit), round_to).alias("cosine"),
        F.col("cell"),
    )
    if exclude_self:
        scored = scored.where(F.col(id_col) != F.lit(qid))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def ivf_stats(
    df: DataFrame,
    centroids: list[list[float]] | None = None,
    *,
    vec_col: str = "embedding",
    cell_col: str | None = None,
    n_cells: int | None = None,
    hot_factor: float = 4.0,
) -> DataFrame:
    """Per-cell occupancy of an IVF layout — the probe-cost gauge (the
    :func:`~data_validation_engine_spark.llmops.dedup.minhash_index_stats`
    pattern applied to the vector index): one row per OCCUPIED cell
    with ``n_rows``, ``frac`` of the table, and ``hot`` (more than
    ``hot_factor`` × the uniform share — the cells that make a probe
    scan blow past ~n_probe/K and the signal to retrain centroids or
    split cells). Empty cells are absent (their probe cost is zero);
    compare ``count(*)`` against K for coverage.

    Pass ``centroids`` to derive the assignment on the fly, or
    ``cell_col`` (+ ``n_cells`` for the uniform-share denominator) for
    a persisted layout. Two map-side-combined aggregations; the totals
    side is a 1-row broadcast."""
    if (centroids is None) == (cell_col is None):
        raise ValueError(
            "ivf_stats: pass exactly one of centroids / cell_col"
        )
    if centroids is not None:
        assigned = ivf_assign(df, centroids, vec_col=vec_col)
        cell_col = "cell"
        k = len(centroids)
    else:
        assigned = df
        if n_cells is None:
            raise ValueError(
                "ivf_stats: cell_col needs n_cells (the layout's K) "
                "for the uniform-share denominator"
            )
        k = int(n_cells)
    counts = assigned.groupBy(cell_col).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = assigned.select(
        F.count(F.lit(1)).alias("__total")
    )
    return counts.crossJoin(F.broadcast(total)).select(
        F.col(cell_col).alias("cell"),
        F.col("n_rows"),
        (F.col("n_rows").cast("double") / F.col("__total")).alias("frac"),
        (
            F.col("n_rows").cast("double") * F.lit(float(k))
            > F.lit(float(hot_factor)) * F.col("__total")
        ).alias("hot"),
    )
