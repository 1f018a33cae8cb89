"""Product quantization (PQ): compressed-vector ANN — the scale path
that pairs with IVF (Jégou 2011, "Product Quantization for Nearest
Neighbor Search"; the FAISS IVF-PQ workhorse re-expressed Spark-first).

Why a 100 TB corpus needs it: a 64-dim float32 embedding is 256 bytes;
its PQ code at ``m=8`` subspaces is 8 bytes — 32× less I/O per scanned
row, and the search-side arithmetic drops from a 64-term cosine fold to
``m`` integer array lookups (asymmetric distance computation, ADC).
Persist the codes once; every probe afterwards scans a table whose hot
column is ``array<int>`` of length ``m``.

Spark-first shape (mirrors :mod:`~data_validation_engine_spark.llmops.ivf`):

- **Codebooks are driver data** (``m × k × d/m`` doubles — a few KB):
  deterministic by construction (subvectors of the first ``k`` vectors
  in id order) or trained offline via :func:`pq_fit`, then embedded as
  broadcast literals, so encode and search are pure map-side
  projections — NO shuffle anywhere in this module.
- **Encode** (:func:`pq_encode`): per subspace, squared-L2 argmin over
  the ``k`` codeword literals — the proven IVF cell expression per
  subspace, ties to the lower code (lexicographic struct min).
- **Search** (:func:`pq_topk`): the query is a 1-row collect (the LSH/
  IVF probe class); the driver builds the ``m × k`` ADC lookup table
  (exact left-fold squared-L2 of query subvectors vs codewords, index
  order), embeds it as a literal, and the per-row distance is a
  ``m``-term ordered fold of table lookups. Ranking ties break on the
  lower id. ``TakeOrderedAndProject`` keeps the top-k without a sort.
- **Train** (:func:`pq_fit`): ``m`` independent
  :func:`~data_validation_engine_spark.llmops.vectors.kmeans_fit` runs
  (one per subspace) on the sliced corpus — the deterministic
  distributed Lloyd's already proven engine-exact; the driver loop is
  over ``m`` (a constant), never over rows.

Determinism contract: every float op is a double left-fold in index
order over exactly-representable inputs-by-construction (float32 casts
and ``round_to`` centroid rounding), the same discipline the IVF/
semantic-dedup oracles replay bit-identically — ADC distances can ride
an oracle-hashed frame as ``floor(dist * 1e6)`` (the hard-negatives
cosine class).

No reference counterpart (`/root/reference` has no vector surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_validation_engine_spark.llmops.ivf import l2sq_col
from data_validation_engine_spark.llmops.similarity import (
    _as_double,
    _dbl_sql,
    dlit_array,
    dlit_matrix,
)

__all__ = [
    "default_codebooks",
    "pq_fit",
    "pq_encode",
    "pq_topk",
    "ivf_pq_topk",
    "pq_topk_many",
    "ivf_pq_topk_many",
    "probe_cells_col",
    "pq_codebooks_to_rows",
    "pq_codebooks_from_rows",
]


def _check_geometry(dim: int, m: int) -> int:
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    if dim % m != 0:
        raise ValueError(
            f"dim {dim} is not divisible by m={m} subspaces — PQ "
            "subvectors must tile the vector exactly"
        )
    return dim // m


def default_codebooks(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    m: int = 8,
    k: int = 16,
) -> list[list[list[float]]]:
    """``codebooks[s][j]`` = subspace ``s`` of the ``j``-th vector in id
    order — the deterministic placeholder quantizer (the
    :func:`~data_validation_engine_spark.llmops.ivf.default_centroids`
    convention); swap in :func:`pq_fit` output for recall."""
    dsub = _check_geometry(dim, m)
    rows = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.col(id_col).asc())
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(
            f"default_codebooks: need {k} vectors, table has {len(rows)}"
        )
    vecs = [[float(x) for x in r[vec_col]] for r in rows]
    return [
        [v[s * dsub : (s + 1) * dsub] for v in vecs] for s in range(m)
    ]


def pq_fit(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    m: int = 8,
    k: int = 16,
    n_iters: int = 2,
    round_to: int = 6,
) -> list[list[list[float]]]:
    """Train per-subspace codebooks: ``m`` independent deterministic
    k-means runs over the sliced corpus (engine-exact — see
    :func:`~data_validation_engine_spark.llmops.vectors.kmeans_fit`).
    Driver traffic is ``m`` × (k × d/m centroids per iteration)."""
    from data_validation_engine_spark.llmops.vectors import kmeans_fit

    dsub = _check_geometry(dim, m)
    books: list[list[list[float]]] = []
    for s in range(m):
        sub = df.select(
            F.col(id_col),
            F.slice(_as_double(F.col(vec_col)), s * dsub + 1, dsub).alias(
                "__sub"
            ),
        )
        books.append(
            kmeans_fit(
                sub, k, id_col=id_col, vec_col="__sub", dim=dsub,
                n_iters=n_iters, round_to=round_to,
            )
        )
    return books


def _checked_size(arr: Column, expected: int, what: str) -> Column:
    """Fail loudly on a corpus row whose array length disagrees with
    the codebook geometry — ``zip_with``/``slice`` would otherwise pad
    with NULLs and silently drop the row from ranking (r12 ADVICE)."""
    return F.when(F.size(arr) == F.lit(expected), arr).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"{what}: expected array length {expected}, got "),
                F.size(arr).cast("string"),
            )
        )
    )


def _code_col(
    vec: Column, codebooks: list[list[list[float]]], s: int, dsub: int
) -> Column:
    """Nearest codeword in subspace ``s``: squared-L2 argmin over the
    codeword literals, ties to the lower code (the IVF cell rule).

    r13 optimization (guide §1.2 per-task work, measured): the
    subspace's codebook rides as ONE nested-array literal traversed by
    a ``transform`` lambda instead of k independently-planned
    ``l2sq(sub, lit_k)`` subtrees — identical index-order folds and
    identical ``array_min`` struct tie rule, but the analyzed plan
    shrinks ~k-fold per subspace (the m×k-subtree form's Catalyst
    analysis dominated pq_encode's wall clock: 4.9s -> 0.6s on 2000
    rows at the bench geometry)."""
    sub = F.slice(_as_double(vec), s * dsub + 1, dsub)
    book_lit = dlit_matrix(codebooks[s])
    return F.array_min(
        F.transform(
            book_lit,
            lambda cw, j: F.struct(
                l2sq_col(sub, cw).alias("d"), j.alias("code")
            ),
        )
    ).getField("code")


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    vec_col: str = "embedding",
    codes_col: str = "pq_codes",
    keep_vec: bool = False,
) -> DataFrame:
    """Attach the ``array<int>`` PQ code (length ``m``) to every row —
    one map-side projection, no shuffle. ``keep_vec=False`` drops the
    raw vector column: the point of the codes table is that downstream
    scans never read the wide column again."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    vec = _checked_size(
        F.col(vec_col), m * dsub, f"pq_encode: {vec_col}"
    )
    out = df.withColumn(
        codes_col,
        F.array(*[_code_col(vec, codebooks, s, dsub) for s in range(m)]),
    )
    return out if keep_vec else out.drop(vec_col)


def pq_topk(
    df: DataFrame,
    query: DataFrame,
    k: int,
    *,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str | None = None,
    exclude_self: bool = True,
    dist_col: str = "pq_dist",
    refine_factor: int | None = None,
    refine_df: DataFrame | None = None,
) -> DataFrame:
    """Top-k by ADC distance: ``(id, pq_dist, rank)`` ascending.

    ``codes_col`` names a pre-encoded codes column (the deployment
    shape — pay :func:`pq_encode` once at ingest); without it the codes
    are derived on the fly from ``vec_col``. The query never encodes:
    ADC compares the EXACT query subvectors against each codeword via
    the driver-built ``m × k`` lookup table, so quantization error is
    paid only on the corpus side (the asymmetric in ADC).

    ``refine_factor=R`` adds the standard exact re-rank (the FAISS
    IVF-PQ "refine" stage): the ADC pass shortlists ``k × R``
    candidates from the 8-byte codes, then ONLY those rows' raw
    vectors (fetched from ``refine_df``, default ``df``) pay an exact
    squared-L2 scoring, and the final top-k ranks by the exact
    distance (``dist_col`` then carries it). Quantization error decides
    at most which candidates enter the shortlist — on
    concentrated-distance corpora this recovers near-exact recall
    while the full scan still only reads codes. The shortlist join is
    a broadcast of k×R ids — bounded driver/exchange traffic by
    construction."""
    qrows = query.select(
        F.col(vec_col).alias("__qvec"), F.col(id_col).alias("__qid")
    ).collect()
    if len(qrows) != 1:
        raise ValueError(f"query must be exactly one row, got {len(qrows)}")
    qvec = [float(x) for x in qrows[0]["__qvec"]]
    qid = qrows[0]["__qid"]
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    if len(qvec) != m * dsub:
        raise ValueError(
            f"query dim {len(qvec)} != m*dsub = {m * dsub}"
        )

    def l2sq(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    # the ADC table: m x k doubles, exact left folds in index order —
    # the same arithmetic the oracle replays in SQL
    lut = [
        [l2sq(qvec[s * dsub : (s + 1) * dsub], cw) for cw in codebooks[s]]
        for s in range(m)
    ]
    lut_lit = dlit_matrix(lut)
    if codes_col is None:
        base = pq_encode(
            df, codebooks, vec_col=vec_col, codes_col="__codes",
            keep_vec=True,
        )
        codes = F.col("__codes")
    else:
        base = df
        codes = _checked_size(
            F.col(codes_col), m, f"pq_topk: {codes_col}"
        )
    # ordered fold in subspace order: acc + LUT[s][code_s]
    dist = F.aggregate(
        F.zip_with(
            codes,
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, s: F.struct(c.alias("c"), s.alias("s")),
        ),
        F.lit(0.0),
        lambda acc, e: acc
        + F.element_at(
            F.element_at(lut_lit, e["s"] + F.lit(1)), e["c"] + F.lit(1)
        ),
    )
    scored = base.select(F.col(id_col), dist.alias(dist_col))
    if exclude_self and qid is not None:
        scored = scored.where(F.col(id_col) != F.lit(qid))
    # TakeOrderedAndProject (per-partition top-k + driver merge), never
    # a global sort or single-partition window; rank is then a window
    # over the K (or k x R) surviving rows only — bounded by
    # construction
    from pyspark.sql import Window

    if refine_factor is not None:
        if refine_factor < 1:
            raise ValueError(
                f"refine_factor must be >= 1, got {refine_factor}"
            )
        shortlist = scored.orderBy(
            F.col(dist_col).asc(), F.col(id_col).asc()
        ).limit(k * refine_factor)
        source = refine_df if refine_df is not None else df
        qlit = dlit_array(qvec)
        exact = source.join(
            F.broadcast(shortlist.select(id_col)), id_col
        ).select(
            F.col(id_col),
            l2sq_col(F.col(vec_col), qlit).alias(dist_col),
        )
        top = exact.orderBy(
            F.col(dist_col).asc(), F.col(id_col).asc()
        ).limit(k)
    else:
        top = scored.orderBy(
            F.col(dist_col).asc(), F.col(id_col).asc()
        ).limit(k)
    return top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col(dist_col).asc(), F.col(id_col).asc())
        ),
    )


def ivf_pq_topk(
    df: DataFrame,
    query: DataFrame,
    k: int,
    *,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str | None = None,
    codes_col: str | None = None,
    n_probe: int = 4,
    exclude_self: bool = True,
    dist_col: str = "pq_dist",
    refine_factor: int | None = None,
    refine_df: DataFrame | None = None,
) -> DataFrame:
    """The full FAISS IVF-PQ shape: coarse cells prune the scan to
    ~``n_probe``/K of the table, ADC over the codes ranks the
    survivors, and ``refine_factor`` optionally exact-re-ranks the
    shortlist — compression (PQ) and pruning (IVF) compose, they don't
    compete.

    Deployment shape: persist the table once with
    :func:`~data_validation_engine_spark.llmops.ivf.ivf_assign` +
    :func:`pq_encode` (name the columns via ``cell_col``/``codes_col``;
    write PARTITIONED BY the cell column and the probe's ``IN`` filter
    becomes partition pruning — the probe then READS ~n_probe/K of the
    bytes and scans only 8-byte codes). Without the persisted columns
    both are derived on the fly (same results, full-scan cost).

    ``refine_factor`` needs raw vectors to re-rank against: either the
    table kept them (``pq_encode(keep_vec=True)``) or ``refine_df``
    names a separate raw-vector table (``id_col`` + ``vec_col``) —
    the usual deployment keeps codes and vectors in different tables
    so the hot scan stays 8 bytes/row."""
    from data_validation_engine_spark.llmops.ivf import ivf_assign

    qrows = query.select(
        F.col(vec_col).alias("__qvec"), F.col(id_col).alias("__qid")
    ).collect()
    if len(qrows) != 1:
        raise ValueError(f"query must be exactly one row, got {len(qrows)}")
    qvec = [float(x) for x in qrows[0]["__qvec"]]

    def l2sq(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    ranked = sorted(
        ((l2sq(qvec, c), i) for i, c in enumerate(centroids))
    )
    probe_cells = [i for _, i in ranked[: max(1, n_probe)]]

    if cell_col is None:
        base = ivf_assign(df, centroids, vec_col=vec_col, cell_col="__cell")
        cell_col = "__cell"
    else:
        base = df
    pruned = base.where(F.col(cell_col).isin(probe_cells))
    return pq_topk(
        pruned,
        query,
        k,
        codebooks=codebooks,
        id_col=id_col,
        vec_col=vec_col,
        codes_col=codes_col,
        exclude_self=exclude_self,
        dist_col=dist_col,
        refine_factor=refine_factor,
        refine_df=(
            (refine_df if refine_df is not None else df)
            if refine_factor is not None
            else None
        ),
    )


def pq_codebooks_to_rows(
    codebooks: list[list[list[float]]],
) -> list[tuple[int, int, list[float]]]:
    """Flatten trained codebooks into ``(subspace, code, centroid)``
    entity rows — the persistable train→search handoff (the
    ``classifier_fit`` weights-entity pattern: fit once, feed every
    later encode/search step from the entity). A geometry sentinel row
    ``(-1, -1, [m, k, dsub])`` declares the full grid so a partially
    read or written entity (lost trailing subspace or codeword rows)
    fails loudly at resolve time instead of silently shrinking the
    quantizer and mis-coding every vector."""
    m = len(codebooks)
    if m < 1 or not codebooks[0]:
        raise ValueError("pq_codebooks_to_rows: empty codebooks")
    k = len(codebooks[0])
    dsub = len(codebooks[0][0])
    rows: list[tuple[int, int, list[float]]] = [
        (-1, -1, [float(m), float(k), float(dsub)])
    ]
    for s, book in enumerate(codebooks):
        if len(book) != k:
            raise ValueError(
                f"pq_codebooks_to_rows: subspace {s} has {len(book)} "
                f"codewords, expected {k}"
            )
        for j, cw in enumerate(book):
            if len(cw) != dsub:
                raise ValueError(
                    f"pq_codebooks_to_rows: codeword ({s},{j}) has "
                    f"dim {len(cw)}, expected {dsub}"
                )
            rows.append((s, j, [float(x) for x in cw]))
    return rows


def pq_codebooks_from_rows(rows) -> list[list[list[float]]]:
    """Rebuild ``codebooks[s][j]`` from entity rows (any order). The
    collect feeding this is bounded: m × k rows of d/m doubles — a few
    KB of driver data by construction. Validates the declared grid is
    COMPLETE (the dense-export check classifier weights get): missing
    sentinel, missing cells, duplicate cells, or a wrong centroid
    length all raise with the cell named."""
    sentinel = None
    cells: dict[tuple[int, int], list[float]] = {}
    for r in rows:
        s, j, cw = int(r[0]), int(r[1]), list(r[2])
        if s == -1 and j == -1:
            sentinel = cw
        elif (s, j) in cells:
            raise ValueError(
                f"pq_codebooks_from_rows: duplicate cell ({s},{j})"
            )
        else:
            cells[(s, j)] = [float(x) for x in cw]
    if sentinel is None or len(sentinel) != 3:
        raise ValueError(
            "pq_codebooks_from_rows: missing geometry sentinel row "
            "(-1, -1, [m, k, dsub]) — not a pq_codebooks_to_rows export"
        )
    m, k, dsub = (int(x) for x in sentinel)
    if len(cells) != m * k:
        raise ValueError(
            f"pq_codebooks_from_rows: entity declares {m}x{k} codewords "
            f"but carries {len(cells)} — partial read/write loses "
            "codewords and would silently mis-code every vector"
        )
    books: list[list[list[float]]] = []
    for s in range(m):
        book = []
        for j in range(k):
            cw = cells.get((s, j))
            if cw is None:
                raise ValueError(
                    f"pq_codebooks_from_rows: missing cell ({s},{j})"
                )
            if len(cw) != dsub:
                raise ValueError(
                    f"pq_codebooks_from_rows: cell ({s},{j}) has dim "
                    f"{len(cw)}, expected {dsub}"
                )
            book.append(cw)
        books.append(book)
    return books


def _books_lit(codebooks: list[list[list[float]]]) -> Column:
    """The full codebook grid as one nested array literal (m × k × dsub
    doubles — a few KB, the same driver-data class as the centroids)."""
    # one parsed SQL expression instead of m*k*dsub py4j lit calls
    # (r13 optimization — see similarity.dlit_array)
    return F.expr(
        "array("
        + ",".join(
            "array("
            + ",".join(
                "array(" + ",".join(_dbl_sql(x) for x in cw) + ")"
                for cw in book
            )
            + ")"
            for book in codebooks
        )
        + ")"
    )


def _adc_dist_col(
    codes: Column,
    qvec: Column,
    books_lit: Column,
    m: int,
    dsub: int,
) -> Column:
    """ADC distance with the QUERY AS A COLUMN (the batched-search
    form): ordered fold over subspaces of the squared-L2 between the
    query's subvector and the row's codeword — each term the same
    index-order double left-fold the single-query LUT path computes
    driver-side, so the two paths are bit-identical by construction."""
    dq = _as_double(qvec)
    return F.aggregate(
        F.zip_with(
            codes,
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, s: F.struct(c.alias("c"), s.alias("s")),
        ),
        F.lit(0.0),
        lambda acc, e: acc
        + l2sq_col(
            F.slice(dq, e["s"] * F.lit(dsub) + F.lit(1), dsub),
            F.element_at(
                F.element_at(books_lit, e["s"] + F.lit(1)),
                e["c"] + F.lit(1),
            ),
        ),
    )


def pq_topk_many(
    df: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str | None = None,
    query_id_col: str | None = None,
    exclude_self: bool = True,
    dist_col: str = "pq_dist",
) -> DataFrame:
    """ADC top-k for EVERY row of a query batch in one distributed
    pass: ``(query_id, id, pq_dist, rank)``, rank ascending per query.

    The batched lift of :func:`pq_topk` (whose 1-row collect + LUT
    literal cannot scale past one query per job): the query table
    broadcasts whole (bounded: a retrieval/eval batch of hundreds to
    thousands of rows, each d doubles), the per-(row, query) distance
    is the query-as-column ADC fold, and per-query ranking is a
    ``row_number <= k`` window that Spark executes as WindowGroupLimit
    — per-partition top-k per query BELOW the exchange, so shuffle
    traffic is ~(queries × k) per partition, never (corpus × queries).
    Composes with :func:`~data_validation_engine_spark.llmops.recall.ann_recall`
    (``group_cols=["query_id"]``) into corpus-level recall measurement.
    Bit-identical to per-query :func:`pq_topk` calls by construction
    (same index-order folds — pytest-pinned)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    qid = query_id_col or id_col
    q = queries.select(
        F.col(qid).alias("query_id"),
        _checked_size(
            F.col(vec_col), m * dsub, f"pq_topk_many: query {vec_col}"
        ).alias("__qvec"),
    )
    if codes_col is None:
        base = pq_encode(
            df, codebooks, vec_col=vec_col, codes_col="__codes",
            keep_vec=True,
        )
        codes = F.col("__codes")
    else:
        base = df
        codes = _checked_size(
            F.col(codes_col), m, f"pq_topk_many: {codes_col}"
        )
    scored = base.crossJoin(F.broadcast(q)).select(
        F.col("query_id"),
        F.col(id_col),
        _adc_dist_col(
            codes, F.col("__qvec"), _books_lit(codebooks), m, dsub
        ).alias(dist_col),
    )
    if exclude_self:
        scored = scored.where(F.col(id_col) != F.col("query_id"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col(dist_col).asc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= F.lit(int(k))
    )


def probe_cells_col(
    vec: Column, centroids: list[list[float]], n_probe: int
) -> Column:
    """The ``n_probe`` nearest IVF cells of a vector COLUMN as an
    ``array<int>`` expression — the batched form of the driver-side
    ranked-centroid loop in :func:`ivf_pq_topk` (same squared-L2 folds,
    same lower-cell tie rule via lexicographic struct sort)."""
    # centroid grid as ONE literal traversed by a lambda (r13 — the
    # _cell_col convention): identical folds and tie rule, ~K-fold
    # smaller analyzed plan
    scored = F.transform(
        dlit_matrix(centroids),
        lambda c, i: F.struct(
            l2sq_col(vec, c).alias("d"), i.alias("cell")
        ),
    )
    return F.transform(
        F.slice(F.array_sort(scored), 1, max(1, int(n_probe))),
        lambda x: x["cell"],
    )


def ivf_pq_topk_many(
    df: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str | None = None,
    codes_col: str | None = None,
    n_probe: int = 4,
    query_id_col: str | None = None,
    exclude_self: bool = True,
    dist_col: str = "pq_dist",
) -> DataFrame:
    """Batched IVF-PQ: every query scans only ITS ``n_probe`` nearest
    cells. Probe cells are computed per query as an expression
    (:func:`probe_cells_col` — no driver loop over queries), exploded
    to ``(query, cell)`` pairs, and equi-joined onto the (persisted or
    derived) cell column — a corpus row is scored only for the queries
    probing its cell, so the scan fraction stays ~n_probe/K per query
    at ANY batch size. Ranking and determinism as
    :func:`pq_topk_many`."""
    from data_validation_engine_spark.llmops.ivf import ivf_assign

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    qid = query_id_col or id_col
    if cell_col is None:
        base = ivf_assign(df, centroids, vec_col=vec_col, cell_col="__cell")
        cell_col = "__cell"
    else:
        base = df
    if codes_col is None:
        base = pq_encode(
            base, codebooks, vec_col=vec_col, codes_col="__codes",
            keep_vec=True,
        )
        codes = F.col("__codes")
    else:
        codes = _checked_size(
            F.col(codes_col), m, f"ivf_pq_topk_many: {codes_col}"
        )
    qprobe = queries.select(
        F.col(qid).alias("query_id"),
        _checked_size(
            F.col(vec_col), m * dsub,
            f"ivf_pq_topk_many: query {vec_col}",
        ).alias("__qvec"),
        F.explode(
            probe_cells_col(F.col(vec_col), centroids, n_probe)
        ).alias("__pcell"),
    )
    scored = base.join(
        F.broadcast(qprobe), F.col(cell_col) == F.col("__pcell")
    ).select(
        F.col("query_id"),
        F.col(id_col),
        _adc_dist_col(
            codes, F.col("__qvec"), _books_lit(codebooks), m, dsub
        ).alias(dist_col),
    )
    if exclude_self:
        scored = scored.where(F.col(id_col) != F.col("query_id"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col(dist_col).asc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= F.lit(int(k))
    )
