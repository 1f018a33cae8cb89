"""Graph analytics over edge tables: deterministic PageRank and
degree-oriented triangle counting.

Extends the engine's graph family (connected components,
`llmops/dedup.py:353,458`) with the other canonical MapReduce graph
algorithm. Use cases in a corpus pipeline: citation/link authority for
crawl prioritisation, host-graph weighting for dedup survivor choice.

Semantics: the simplified power iteration ``pr'(v) = (1-d)/N + d *
sum_{u -> v} pr(u)/outdeg(u)`` for a FIXED number of iterations, without
dangling-mass redistribution (sinks leak rank, so ranks sum to <= 1 —
the standard simplified variant; a fixed iteration count rather than an
epsilon stop keeps the computation an exact finite formula any engine
can replay).

Determinism is the engineering point: a grouped float SUM is the one
aggregate whose result depends on partition arrival order. Every
per-target reduction here is a TWO-LEVEL ordered fold (the
`llmops/vectors.py:37` trick, keyed by an md5 segment of the source id
because graph ids are not dense): contributions fold within their
segment in source-id order, segment sums fold in segment order — so
ranks are bit-identical across reruns, partitionings, and engines
(IEEE-754 operations are exactly specified; only ORDER is ambiguous,
and the fold pins it), and no single aggregation buffer holds more than
~indegree/64 contributions even for a hot target.

Scale shape: per iteration, one broadcast-or-shuffle join of edges to
the current rank vector (narrow: ``(src, dst, double)``) and one grouped
fold keyed by ``dst`` — the canonical Pregel/MapReduce PageRank plan.
The driver loop holds only the iteration counter; ranks stay
distributed, with a ``localCheckpoint`` per round to truncate lineage
(same pattern as connected components). ``N`` (node count) is the one
driver-side scalar, the same bounded collect CC's convergence check
performs.

The reference has no graph surface; net-new extension per SURVEY §8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration deterministic PageRank over a directed edge list.

    Returns ``(node, pagerank)`` for every node appearing as a source or
    target. Duplicate edges are collapsed first (multi-edges would
    double-count contributions); self-loops participate like any edge.

    ``weight_col`` switches to the weighted variant: a source splits its
    rank proportionally to edge weight (``w / out_strength``) instead of
    evenly. Non-positive and NULL weights drop the edge; duplicate
    ``(src, dst)`` edges collapse to their MAXIMUM weight (an order-free
    reduction — a float SUM over duplicates would be partition-order
    dependent). Out-strength is the same segmented two-level ordered
    fold as the contribution sum, so the weighted path keeps the
    bit-determinism guarantee.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if weight_col is None:
        e = (
            edges.select(
                F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
            )
            .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .distinct()
        )
    else:
        w = F.col(weight_col).cast("double")
        e = (
            edges.select(
                F.col(src_col).alias("src"),
                F.col(dst_col).alias("dst"),
                w.alias("__w"),
            )
            .where(
                F.col("src").isNotNull()
                & F.col("dst").isNotNull()
                & (F.col("__w") > 0)
            )
            .groupBy("src", "dst")
            .agg(F.max("__w").alias("__w"))
        )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if checkpoint:
        # nodes re-enters the plan EVERY round (the left join that
        # restores zero-in-degree vertices); without truncation each
        # iteration would re-derive it from the raw edges — at scale,
        # two extra edge scans per round
        nodes = nodes.localCheckpoint(eager=True)
    n_nodes = nodes.count()  # bounded driver scalar (like CC's converge check)
    if n_nodes == 0:
        return nodes.withColumn("pagerank", F.lit(0.0))
    init = 1.0 / float(n_nodes)
    base = (1.0 - damping) / float(n_nodes)

    def _fold(sorted_structs: F.Column, field: str) -> F.Column:
        return F.aggregate(
            F.transform(sorted_structs, lambda s: s[field]),
            F.lit(0.0),
            lambda acc, c: acc + c,
        )

    def _seg(col: F.Column) -> F.Column:
        return (
            F.conv(
                F.substring(F.md5(col.cast("string")), 1, 4), 16, 10
            ).cast("int")
            % 64
        )

    if weight_col is None:
        outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    else:
        # out-strength: deterministic segmented fold of the source's edge
        # weights (dst-sorted within md5 segments) — a plain SUM would be
        # shuffle-order dependent
        wseg = e.groupBy("src", _seg(F.col("dst")).alias("__s")).agg(
            _fold(
                F.sort_array(F.collect_list(F.struct("dst", "__w"))), "__w"
            ).alias("__ss")
        )
        outdeg = wseg.groupBy("src").agg(
            _fold(
                F.sort_array(F.collect_list(F.struct("__s", "__ss"))), "__ss"
            ).alias("__deg")
        )
    # (src, dst[, w], deg/strength): the static join reused every round
    links = e.join(outdeg, on="src", how="inner")
    if checkpoint:
        links = links.localCheckpoint(eager=False)

    ranks = nodes.withColumn("pagerank", F.lit(init))
    for _ in range(iterations):
        contribs = links.join(ranks, on=[links.src == ranks.node]).select(
            "src",
            "dst",
            # deterministic segment from the source id's md5 (uniform for
            # md5's avalanche): bounds any single aggregation buffer to
            # ~indegree/64 — a hot target with 10^8 in-links folds 64
            # partial sums, never one 10^8-element list (the two-level
            # trick of llmops/vectors.py, keyed by hash because src ids
            # are not dense)
            _seg(F.col("src")).alias("__seg"),
            (
                (F.col("pagerank") / F.col("__deg"))
                if weight_col is None
                else (F.col("pagerank") * F.col("__w") / F.col("__deg"))
            ).alias("__c"),
        )
        seg_sums = contribs.groupBy("dst", "__seg").agg(
            _fold(
                F.sort_array(F.collect_list(F.struct("src", "__c"))), "__c"
            ).alias("__segsum")
        )
        summed = seg_sums.groupBy("dst").agg(
            _fold(
                F.sort_array(F.collect_list(F.struct("__seg", "__segsum"))),
                "__segsum",
            ).alias("__s")
        )
        ranks = (
            nodes.join(summed, on=[nodes.node == summed.dst], how="left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("__s"), F.lit(0.0))
                ).alias("pagerank"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def triangle_count(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over an undirected graph, exact.

    Returns ``(node, n_tri)`` for every node that closes at least one
    triangle (left-join onto the node table for zero-filled counts).
    Edges are treated as undirected: direction is dropped, duplicates
    and self-loops are removed before counting, so the result is a pure
    function of the edge SET. Counts are integers — no float aggregation,
    so the result is trivially partition-order-independent.

    Corpus use: triangle density inside a near-dup pair graph separates
    tight plagiarism clusters (cliques — high counts) from chains of
    borderline matches (paths — zero triangles) before any survivor
    decision.

    Scale shape — the degree-oriented wedge algorithm (the MapReduce
    formulation used by GraphX/Cohen): orient every canonical edge from
    its lower-(degree, id) endpoint to the higher one, so each node's
    OUT-adjacency is O(sqrt(m)) regardless of its raw degree; wedges
    (pairs of out-neighbours of one apex) are a self-equi-join on the
    apex; a wedge closes iff its endpoint pair is itself a canonical
    edge — one more equi-join. Every triangle materialises exactly once
    (its vertices carry a strict orientation order), so no /3 or /6
    correction is needed — the per-triangle row then attributes one
    count to each of its three vertices. The hot-node n² blow-up the
    naive wedge join suffers is exactly what the orientation removes:
    a 10M-degree hub in 100 TB of edges still fans out only to
    out-neighbours of yet-higher degree.
    """
    a, b = F.col(src_col), F.col(dst_col)
    canon = (
        edges.where(a != b)
        .select(
            F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
        )
        .distinct()
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select("b"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    # orient from the strictly-smaller (deg, id) endpoint; (deg, id) is a
    # total order so orientation is deterministic and acyclic
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        canon.join(da, "a").join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        )
    )
    o1 = oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("x"))
    o2 = oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("y"))
    wedges = o1.join(o2, "apex").where(F.col("x") < F.col("y"))
    closing = canon.select(
        F.col("a").alias("cx"), F.col("b").alias("cy")
    )
    triangles = wedges.join(
        closing,
        (F.least("x", "y") == F.col("cx"))
        & (F.greatest("x", "y") == F.col("cy")),
    ).select("apex", "x", "y")
    return (
        triangles.select(F.col("apex").alias("node"))
        .unionAll(triangles.select("x"))
        .unionAll(triangles.select("y"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
