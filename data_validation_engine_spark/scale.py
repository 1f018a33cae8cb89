"""Scale utilities: co-located (bucketed) joins and skew salting.

The operators in :mod:`steps` rely on Catalyst/AQE to pick join strategies;
these helpers cover the two cases where the 100 TB plan needs explicit
layout decisions the optimizer cannot make for you:

- **Bucketing** (:func:`write_bucketed`, for repeatedly-joined tables):
  pre-shuffle both sides into the same bucket layout at write time so every
  subsequent equi-join on the bucket key is shuffle-free (SortMergeJoin
  over pre-bucketed scans, no Exchange). Pay the shuffle once, not per
  query.
- **Salting** (:func:`salted_left_join`, for skewed keys AQE cannot fix —
  e.g. a broadcast-ineligible build side with one hot key): the source
  scatters each row to one of ``n_salts`` sub-keys and the target is
  replicated ``n_salts`` times, so a hot key's rows spread over
  ``n_salts`` tasks instead of one straggler. AQE's skew-join handles most
  cases (``spark.sql.adaptive.skewJoin.enabled`` is on by default); reach
  for salting only when the skewed side also needs aggregation or AQE's
  split thresholds don't trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    *,
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write a table bucketed (and optionally sorted) by join keys.

    Joins between tables bucketed identically on their join key read
    co-located buckets and skip the shuffle entirely; sorting inside
    buckets additionally skips the sort of a SortMergeJoin.
    """
    writer = (
        df.write.mode(mode)
        .format(fmt)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle exchanges in the executed plan (plan audit
    helper: a co-located join should report 0)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )


def salted_left_join(
    source: DataFrame,
    target: DataFrame,
    on: str,
    *,
    n_salts: int = 8,
    how: str = "left",
) -> DataFrame:
    """Equi-join with the source's hot keys scattered over ``n_salts``
    sub-keys and the target replicated to match.

    Deterministic scatter (hash of the whole source row modulo
    ``n_salts``), so reruns produce identical task assignment. Result
    equals ``source.join(target, on, how)`` for 1:1/1:N targets; the
    target replication multiplies the small side, so keep it broadcast-
    sized per salt.
    """
    src = source.withColumn(
        "__salt",
        F.pmod(
            F.hash(*[F.col(c) for c in source.columns]), F.lit(n_salts)
        ).cast("int"),
    )
    tgt = target.crossJoin(
        F.broadcast(
            src.sparkSession.range(n_salts).select(
                F.col("id").cast("int").alias("__salt")
            )
        )
    )
    joined = src.join(tgt, on=[on, "__salt"], how=how)
    return joined.drop("__salt")


def repartition_for_parallelism(
    df: DataFrame, spark: SparkSession | None = None
) -> DataFrame:
    """Spread a small-file input across the cluster's cores (single-file
    parquet = one input split = one busy core for CPU-heavy operators)."""
    spark = spark or df.sparkSession
    return df.repartition(spark.sparkContext.defaultParallelism)
