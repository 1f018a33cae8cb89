"""Interval-overlap (range) join — the time/range join Spark executes as
a nested-loop unless you restate it.

``interval_join(left, right, ...)`` returns every (left, right) pair
whose ``[start, end]`` intervals overlap (optionally per key): event
windows x maintenance windows, sessions x promotions, reads x genome
bins. Written naively (``l.start <= r.end AND r.start <= l.end``) Spark
has no equi-condition, so Catalyst falls back to
BroadcastNestedLoopJoin / CartesianProduct — quadratic and a
100 TB-killer.

The scale shape here is the standard binning reformulation (used by the
genomics interval-join literature and Databricks' range-join hint, both
public): quantise time into fixed-width buckets, explode each interval
onto the buckets it covers, equi-join on (key..., bucket), then apply
the exact overlap predicate. Every overlapping pair shares the bucket
containing ``greatest(l.start, r.start)``, so keeping ONLY that bucket's
match (``bucket == floor(max(starts)/width)``) both guarantees
completeness and dedupes pairs spanning several buckets WITHOUT a
``distinct`` shuffle.

Cost: one shuffle of the exploded frames on (key, bucket). The fan-out
per row is ``span/bucket_width + 1`` — pick ``bucket_width`` near the
typical interval span (too small explodes rows; too large piles
non-overlapping rows into one bucket and the predicate does the work).
Skew = hot (key, bucket) pairs, the same exposure as any equi-join, so
AQE skew-join handles it.

Provenance: reference has no range join; this is net-new corpus/events
vocabulary. The binning technique is public knowledge (e.g. bedtools /
GenomicRanges binning, Spark SQL range-join blog posts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_validation_engine_spark.llmops.asof import _ts_seconds


def _prefixed(df: DataFrame, prefix: str) -> DataFrame:
    return df.select(
        *[F.col(f"`{c}`").alias(f"{prefix}{c}") for c in df.columns]
    )


def _bucketed(df: DataFrame, start: str, end: str, width: float) -> DataFrame:
    s = _ts_seconds(F.col(start), df.schema[start].dataType)
    e = _ts_seconds(F.col(end), df.schema[end].dataType)
    return (
        df.withColumn("__s", s)
        .withColumn("__e", e)
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("__s") / F.lit(width)),
                    F.floor(F.col("__e") / F.lit(width)),
                )
            ),
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: list[str] | str | None = None,
    bucket_width: float = 3600.0,
    prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs with overlapping closed intervals
    (``l.start <= r.end AND r.start <= l.end``), optionally restricted
    to equal ``on`` keys. Right-side columns come back ``prefix``-ed;
    the output holds every left column plus every prefixed right column
    (join keys once, unprefixed).

    Interval endpoints may be timestamps (compared on the epoch-seconds
    line) or plain numerics; a point event is an interval with
    ``start == end``. Each side's end must be >= its start (rows
    violating it simply cannot match, mirroring the naive predicate).
    """
    keys = [on] if isinstance(on, str) else list(on or [])
    lb = _bucketed(left, left_start, left_end, bucket_width)
    rb = _bucketed(
        _prefixed(right, prefix),
        f"{prefix}{right_start}",
        f"{prefix}{right_end}",
        bucket_width,
    )
    join_keys = [*keys, "__bucket"]
    if keys:
        rb = rb.withColumnsRenamed({f"{prefix}{k}": k for k in keys})
    overlap = (F.col("__s") <= F.col("__re")) & (
        F.col("__rs") <= F.col("__e")
    )
    # completeness + dedup in one predicate: the overlap's first covered
    # bucket is floor(max(starts)/width); every overlapping pair meets in
    # exactly that one bucket of the exploded join.
    anchor = F.col("__bucket") == F.floor(
        F.greatest(F.col("__s"), F.col("__rs")) / F.lit(float(bucket_width))
    )
    out = (
        lb.join(
            rb.withColumnsRenamed({"__s": "__rs", "__e": "__re"}),
            on=join_keys,
            how="inner",
        )
        .where(overlap & anchor)
        .drop("__s", "__e", "__rs", "__re", "__bucket")
    )
    # restore left-first column order with keys in their left positions
    left_cols = [c for c in left.columns]
    right_cols = [
        f"{prefix}{c}" for c in right.columns if c not in keys
    ]
    return out.select(*left_cols, *right_cols)
