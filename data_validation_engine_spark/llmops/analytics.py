"""Grouped-ranking and rolling-window analytics — corpus-curation
primitives (top-k documents per source by quality, rolling event rates
per user, grouped score percentiles).

Scale shapes:

- :func:`grouped_topk` is ONE shuffle on the group keys; the ``rank <=
  k`` filter sits directly on the window so Spark's WindowGroupLimit
  rewrite (public optimizer rule, Spark 3.5+) keeps a size-k heap per
  key on the map side instead of sorting whole groups — at 100 TB the
  shuffle carries at most k rows per key per map partition, not the
  corpus.
- :func:`rolling_agg` is one keyed window with a RANGE frame on the
  epoch-seconds line — one shuffle, state bounded by the frame span, no
  self-join reformulation (the naive "join each row to its trailing
  window" is quadratic in the frame population).

Provenance: the reference engine has no ranking/rolling vocabulary
(group_by + pivot only, dve spark/rules.py); these extend the corpus
toolbox with standard SQL-window semantics so DuckDB window SQL is the
independent oracle.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_validation_engine_spark.llmops.asof import _ts_seconds


def grouped_topk(
    df: DataFrame,
    group_cols: list[str] | str,
    order_col: str,
    k: int,
    *,
    descending: bool = True,
    tiebreak_cols: list[str] | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-``k`` rows per group by ``order_col``, deterministic under
    ``tiebreak_cols`` (always order by them ascending after the primary
    key so reruns and other engines agree row-for-row).

    Output = input columns + ``rank_col`` (1-based dense position by
    ``row_number``).
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    primary = F.col(order_col).desc() if descending else F.col(order_col).asc()
    order = [primary] + [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*groups).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= F.lit(int(k)))
    )


def rolling_agg(
    df: DataFrame,
    *,
    partition_cols: list[str] | str,
    ts_col: str,
    window_seconds: float,
    aggs: Mapping[str, Column],
    include_current: bool = True,
) -> DataFrame:
    """Trailing-window aggregates per key over event time: for each row,
    aggregate the partition's rows whose timestamp lies in
    ``[ts - window_seconds, ts]`` (closed). ``include_current=False``
    shifts the frame to ``[ts - window_seconds, ts - 1us]`` — "state
    strictly before me", the leakage-safe variant.

    The RANGE frame runs on the microsecond line (timestamps via
    ``unix_micros``, numerics scaled by 1e6) so bounds are exact longs —
    no float row-inclusion ambiguity at the window edge.

    ``aggs`` maps output column name -> aggregate Column (e.g.
    ``{"avg_v": F.avg("value"), "n": F.count(F.lit(1))}``); each is
    applied ``.over`` the rolling frame.
    """
    keys = (
        [partition_cols]
        if isinstance(partition_cols, str)
        else list(partition_cols)
    )
    sec = _ts_seconds(F.col(ts_col), df.schema[ts_col].dataType)
    micros = F.round(sec * F.lit(1e6)).cast("long")
    upper = 0 if include_current else -1
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__us"))
        .rangeBetween(-int(round(window_seconds * 1e6)), upper)
    )
    out = df.withColumn("__us", micros)
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out.drop("__us")
