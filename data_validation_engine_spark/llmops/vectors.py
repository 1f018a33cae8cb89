"""Deterministic distributed vector aggregation: per-label centroids and
nearest-prototype assignment over embedding columns.

This is the engine's only cross-row float aggregation, and floating-point
addition is not associative — a naive ``groupBy(label).agg(sum)`` would
give shuffle-order-dependent results that can never hash-match an oracle
(or even a re-run of itself). The fix is a deterministic fold ORDER, made
distributed by a two-level segment tree:

1. rows are bucketed into fixed-size segments by ``id div segment_size``;
   each ``(group, segment)`` folds its vectors elementwise in ascending id
   order (one narrow shuffle; per-task memory bounded by ``segment_size``
   vectors);
2. each group folds its segment sums in ascending segment order.

The result is bit-identical regardless of partitioning or cluster size,
and equals the same two-level fold written in DuckDB SQL — which is what
makes the oracle row possible. Groups larger than
``segment_size * max-rows-per-task`` recurse by adding a level; two
levels already cover ~10^9 vectors per group at the default size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_validation_engine_spark.llmops.similarity import cosine_col

DEFAULT_SEGMENT_SIZE = 1024


def _zero(dim: int) -> Column:
    return F.array_repeat(F.lit(0.0), dim)


def _fold_sum(sorted_vecs: Column, dim: int) -> Column:
    """Elementwise sum of an ordered array of double-arrays, left fold
    starting at the zero vector (0.0 + x == x elementwise, so the zero
    start matches an init-less first-element fold bit-for-bit)."""
    return F.aggregate(
        sorted_vecs,
        _zero(dim),
        lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
    )


def grouped_vector_sum(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    vec_col: str,
    *,
    dim: int,
    segment_size: int = DEFAULT_SEGMENT_SIZE,
) -> DataFrame:
    """Deterministic per-group elementwise vector sum + row count.

    Returns ``(*group_cols, n, vec_sum)`` where ``vec_sum`` is the
    two-level ordered fold described in the module docstring. ``order_col``
    must be unique per row within a group (any total order works; ids are
    the natural choice).
    """
    seg = F.when(
        F.col("__ord") >= 0, F.expr(f"__ord div {segment_size}")
    ).otherwise(-F.expr(f"(-__ord + {segment_size - 1}) div {segment_size}"))
    base = df.select(
        *group_cols,
        F.col(order_col).alias("__ord"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).select(
        *group_cols,
        "__ord",
        # FLOOR division in exact long arithmetic (Spark `div` truncates
        # toward zero; DuckDB `//` floors — negative order values must
        # bucket identically in both engines)
        seg.alias("__seg"),
        "__v",
    )
    seg_sums = base.groupBy(*group_cols, "__seg").agg(
        F.count(F.lit(1)).alias("__n"),
        _fold_sum(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__ord", "__v"))),
                lambda s: s["__v"],
            ),
            dim,
        ).alias("__segsum"),
    )
    return seg_sums.groupBy(*group_cols).agg(
        F.sum("__n").alias("n"),
        _fold_sum(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__seg", "__segsum"))),
                lambda s: s["__segsum"],
            ),
            dim,
        ).alias("vec_sum"),
    )


def label_centroids(
    df: DataFrame,
    label_col: str,
    id_col: str,
    vec_col: str,
    *,
    dim: int,
    segment_size: int = DEFAULT_SEGMENT_SIZE,
    round_to: int = 6,
) -> DataFrame:
    """Per-label centroid vectors: ``(label, n, centroid)``.

    The sum is the deterministic two-level fold; the centroid divides each
    component by ``n`` once at the end (one float division per dimension,
    same operands in every engine), rounded to ``round_to`` for stable
    cross-engine rendering.
    """
    sums = grouped_vector_sum(
        df, [label_col], id_col, vec_col, dim=dim, segment_size=segment_size
    )
    return sums.select(
        label_col,
        "n",
        F.transform(
            F.col("vec_sum"),
            lambda x: F.round(x / F.col("n").cast("double"), round_to),
        ).alias("centroid"),
    )


def nearest_centroid(
    df: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    centroid_col: str = "centroid",
    round_to: int = 6,
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine: ``(id,
    assigned_label, cosine)``.

    ``centroids`` is small (one row per label) and is broadcast, so the
    scoring join is map-side; the argmax is a per-id window ranked on
    ``(rounded cosine DESC, label ASC)`` — the rounding plus the label
    tiebreak make the winner engine-exact even when two centroids score
    identically.
    """
    scored = df.select(id_col, vec_col).crossJoin(
        F.broadcast(
            centroids.select(
                F.col(label_col).alias("__clabel"),
                F.col(centroid_col).alias("__cvec"),
            )
        )
    ).select(
        F.col(id_col),
        F.col("__clabel"),
        F.round(cosine_col(F.col(vec_col), F.col("__cvec")), round_to).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cosine").desc(), F.col("__clabel").asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select(
            F.col(id_col),
            F.col("__clabel").alias("assigned_label"),
            "cosine",
        )
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    n_iters: int = 2,
    segment_size: int = DEFAULT_SEGMENT_SIZE,
    round_to: int = 6,
) -> list[list[float]]:
    """Deterministic distributed k-means (Lloyd's), engine-exact.

    Composition of two proven deterministic parts: assignment is the IVF
    cell expression (squared-L2 argmin over broadcast centroid literals,
    ties to the lower cell — map-side, no shuffle), and the update is
    :func:`grouped_vector_sum`'s two-level ORDERED fold keyed by cell, so
    every iteration is bit-identical under any partitioning AND equal to
    the same unrolled chain written in DuckDB SQL — k-means with an exact
    oracle, which a naive float groupBy-mean can never have. New
    centroids are rounded to ``round_to`` in-engine each iteration (the
    rounding is part of the contract: it pins the operands of the next
    iteration), and an empty cell keeps its previous centroid. Driver
    traffic per iteration is the k x dim centroid table only.

    Returns the final centroids (feed to :func:`ivf_topk` /
    :func:`ivf_assign` / :func:`nearest_centroid`).
    """
    from data_validation_engine_spark.llmops.ivf import (
        default_centroids,
        ivf_assign,
    )

    narrow = df.select(id_col, vec_col)
    cents = default_centroids(
        narrow, id_col=id_col, vec_col=vec_col, n_cells=k
    )
    for _ in range(n_iters):
        assigned = ivf_assign(narrow, cents, vec_col=vec_col)
        sums = grouped_vector_sum(
            assigned, ["cell"], id_col, vec_col,
            dim=dim, segment_size=segment_size,
        )
        rows = sums.select(
            "cell",
            F.transform(
                "vec_sum",
                lambda x: F.round(x / F.col("n").cast("double"), round_to),
            ).alias("centroid"),
        ).collect()
        by_cell = {
            r["cell"]: [float(v) for v in r["centroid"]] for r in rows
        }
        cents = [by_cell.get(i, cents[i]) for i in range(k)]
    return cents


def quantize_vectors(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    qvec_col: str = "qvec",
    scale_col: str = "scale",
    round_to: int = 9,
) -> DataFrame:
    """Symmetric per-vector int8 quantization of an embedding column:
    each vector stores ``scale = round(max(|v_i|)/127, round_to)`` and
    ``q_i = round(v_i / scale)`` in [-127, 127] — 4x smaller at rest
    than float32 (8x vs Spark's in-memory doubles), the standard
    storage/serving trade for 100 TB embedding tables (recall loss under
    int8 symmetric quantization is typically <1% for cosine ranking).

    Determinism is the design point, as everywhere in this module: the
    scale is per-row (no cross-row aggregation at all — a zero-shuffle
    projection), the division is a single IEEE op on a ROUNDED scale
    (the round pins the decimal literal any engine reconstructs
    bit-identically), and ties round half-up via SQL ROUND on both
    engines. All-zero and NULL vectors take scale 0 with a zero/NULL
    qvec respectively (documented edge, not UB); a non-zero vector whose
    max magnitude is below the rounding grain keeps its exact unrounded
    ``max(|v_i|)/127`` scale rather than underflowing to an all-zero
    qvec.

    Returns ``(id, scale, qvec)``. :func:`dequantize_col` rebuilds the
    approximate float vector as ``q_i * scale`` for downstream exact-SQL
    scoring; quantized dot products can also run entirely in integer
    arithmetic (exact) and rescale once per pair.
    """
    v = F.col(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    rounded = F.round(amax / F.lit(127.0), round_to)
    # underflow guard: a non-zero vector with max|v| below the rounding
    # grain (~6.4e-8 at round_to=9) would round its scale to 0 and
    # silently quantize to all zeros — keep the exact unrounded scale for
    # those rows instead (still a single IEEE division, engine-exact)
    scale = F.when((rounded == 0) & (amax > 0), amax / F.lit(127.0)).otherwise(
        rounded
    )
    qvec = F.when(
        scale > 0,
        F.transform(
            v, lambda x: F.round(x / scale).cast("tinyint")
        ),
    ).otherwise(
        F.transform(v, lambda x: F.lit(0).cast("tinyint"))
    )
    return df.select(
        F.col(id_col),
        F.when(v.isNull(), F.lit(None).cast("double"))
        .otherwise(scale)
        .alias(scale_col),
        F.when(v.isNull(), F.lit(None)).otherwise(qvec).alias(qvec_col),
    )


def dequantize_col(qvec: Column, scale: Column) -> Column:
    """Approximate float vector from an int8-quantized one:
    ``q_i * scale`` elementwise (one IEEE multiply per component —
    engine-exact given the stored rounded scale)."""
    return F.transform(qvec, lambda q: q.cast("double") * scale)


def projection_matrix(
    in_dim: int,
    out_dim: int,
    *,
    seed: str = "",
) -> list[list[float]]:
    """Deterministic Rademacher (+-1) random-projection matrix from md5:
    component ``(i, j)`` is the sign of the low bit of
    ``md5(seed:i:j)`` — reproducible from the seed alone on any machine
    or engine, no RNG state to ship. By Johnson-Lindenstrauss /
    Achlioptas, +-1 entries preserve pairwise distances as well as
    Gaussian ones; ``out_dim`` of 8-32 already separates well for
    64-dim inputs.
    """
    import hashlib

    if in_dim < 1 or out_dim < 1:
        raise ValueError(
            f"projection dims must be >= 1, got ({in_dim}, {out_dim})"
        )
    return [
        [
            1.0
            if hashlib.md5(f"{seed}:{i}:{j}".encode()).digest()[-1] & 1
            else -1.0
            for j in range(in_dim)
        ]
        for i in range(out_dim)
    ]


def project_vectors(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    matrix: list[list[float]],
    *,
    proj_col: str = "proj",
    round_to: int | None = None,
) -> DataFrame:
    """Project an embedding column through a literal matrix (one row per
    output dimension): ``proj[i] = dot(vec, matrix[i])``, each dot an
    ordered left fold so the result is bit-identical across engines and
    partitionings. With a :func:`projection_matrix`, this is the JL
    dimensionality reduction that makes 100 TB ANN/IVF tractable: a
    zero-shuffle map-side projection (the matrix ships as plan literals,
    never a join), cutting every downstream distance computation and
    index size by ``in_dim/out_dim``.

    ``round_to`` optionally rounds components (use 6 before comparing
    across engines after any transcendental post-processing; the raw
    projection itself needs no rounding — products and ordered sums of
    literals are exact IEEE replays).
    """
    if not matrix or not matrix[0]:
        raise ValueError("projection matrix must be non-empty")
    width = len(matrix[0])
    if any(len(row) != width for row in matrix):
        raise ValueError("projection matrix rows must have equal length")
    from data_validation_engine_spark.llmops.similarity import dot_col

    v = F.col(vec_col)
    comps = []
    for row in matrix:
        lit_row = F.array(*[F.lit(float(x)) for x in row])
        c = dot_col(v, lit_row)
        if round_to is not None:
            c = F.round(c, round_to)
        comps.append(c)
    return df.select(F.col(id_col), F.array(*comps).alias(proj_col))
