"""Graph centrality over edge tables: deterministic PageRank.

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
per-target reduction here is an ORDERED fold — contributions are
collected per target, sorted by source id, and folded left-to-right
from 0.0 (`F.aggregate`), the same two-level trick as the vector
aggregation family (`llmops/vectors.py:37`) — so the ranks are
bit-identical across reruns, partitionings, and engines (IEEE-754
operations are exactly specified; only ORDER is ambiguous, and the fold
pins it).

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
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration deterministic PageRank over a directed edge list.

    Returns ``(node, pagerank)`` for every node appearing as a source or
    target. Duplicate edges are collapsed first (multi-edges would
    double-count contributions); self-loops participate like any edge.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
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

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    # (src, dst, deg): the static join structure reused every round
    links = e.join(outdeg, on="src", how="inner")
    if checkpoint:
        links = links.localCheckpoint(eager=False)

    ranks = nodes.withColumn("pagerank", F.lit(init))
    for _ in range(iterations):
        contribs = links.join(ranks, on=[links.src == ranks.node]).select(
            "src",
            "dst",
            (F.col("pagerank") / F.col("__deg")).alias("__c"),
        )
        summed = contribs.groupBy("dst").agg(
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("src", "__c"))),
                    lambda s: s["__c"],
                ),
                F.lit(0.0),
                lambda acc, c: acc + c,
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
