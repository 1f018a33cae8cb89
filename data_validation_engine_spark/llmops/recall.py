"""ANN quality measurement: recall@k of an approximate top-k against
the exact top-k (r12 verdict, "What's missing" #2 — the tuning target
for ``n_probe``/``pq_m``/``refine_factor`` that the approximate paths
otherwise lack).

Recall@k is THE standard ANN quality metric (the ann-benchmarks.com
convention): for each query, ``|approx ∩ exact| / k``. Both inputs are
top-k frames (``k`` rows per query/group), so everything here is
bounded by construction — the join is semi over ≤ groups × k rows, the
aggregation emits one row per group, and the division is a single
correctly-rounded double op over exact integers (the engine-exact
class every oracle replays bit-identically).

Scale shape: measurement runs on a SAMPLE of queries (hundreds), never
the corpus — each query's two top-k frames are what's expensive, and
those costs belong to the search operators being measured. This module
never touches the vectors.

No reference counterpart (``/root/reference`` has no vector surface).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ann_recall"]


def ann_recall(
    approx: DataFrame,
    exact: DataFrame,
    *,
    id_col: str = "vec_id",
    group_cols: Sequence[str] = (),
    k: int | None = None,
    recall_col: str = "recall",
) -> DataFrame:
    """Per-group recall of ``approx`` against ``exact``.

    Both frames carry the retrieved ``id_col`` plus the shared
    ``group_cols`` (query id, method, ... — empty for single-query
    frames). Output: one row per group with ``n_hits`` (ids in both),
    ``n_exact``, ``n_approx`` (exact longs) and ``recall`` =
    ``n_hits / (k or n_exact)``. The denominator defaults to the
    EXACT side's size — the honest denominator when the exact frame
    was cut short (corpus smaller than k); pass ``k`` to pin the
    conventional fixed-k denominator.

    Groups present on only one side still emit a row (full outer over
    the group-bounded aggregates, counts null-filled to 0) — an
    approximate method returning nothing for a query must read as
    recall 0, not as a silently missing row.
    """
    keys = [*group_cols, id_col]
    for c in keys:
        if c not in approx.columns:
            raise ValueError(f"ann_recall: approx frame lacks column {c!r}")
        if c not in exact.columns:
            raise ValueError(f"ann_recall: exact frame lacks column {c!r}")
    if k is not None and k < 1:
        raise ValueError(f"ann_recall: k must be >= 1, got {k}")
    gcols = list(group_cols)

    def _count(df: DataFrame, name: str) -> DataFrame:
        agg = df.groupBy(*gcols).agg(F.count(F.lit(1)).alias(name))
        return agg

    # top-k frames are k rows per group — the exact side broadcasts
    hits = _count(
        approx.join(F.broadcast(exact.select(*keys)), keys, "left_semi"),
        "n_hits",
    )
    n_exact = _count(exact, "n_exact")
    n_approx = _count(approx, "n_approx")
    if gcols:
        joined = n_exact.join(n_approx, gcols, "full").join(
            hits, gcols, "full"
        )
    else:
        joined = n_exact.crossJoin(n_approx).crossJoin(hits)
    denom = (
        F.lit(int(k)).cast("double")
        if k is not None
        else F.coalesce(F.col("n_exact"), F.lit(0)).cast("double")
    )
    return joined.select(
        *gcols,
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        F.coalesce(F.col("n_exact"), F.lit(0)).alias("n_exact"),
        F.coalesce(F.col("n_approx"), F.lit(0)).alias("n_approx"),
        F.when(
            denom > 0,
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("double") / denom,
        )
        .otherwise(F.lit(None).cast("double"))
        .alias(recall_col),
    )
