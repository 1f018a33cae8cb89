"""Trailing-window rolling counts: exact event-time windows on a stream.

Batch :func:`~data_validation_engine_spark.llmops.analytics.rolling_agg`
computes per-row trailing aggregates with a RANGE window frame — an
operator Structured Streaming's built-ins cannot express (streaming
supports *tumbling/sliding grouped* windows, not a per-ROW trailing
frame). This is the second custom stateful operator built on
``applyInPandasWithState`` (the first: ``sessions.py``), and the pattern
for any per-key running analytic the built-ins lack.

Semantics: for every event, emit the number of the SAME key's events
with timestamp in ``[ts - window_seconds, ts]`` (closed, batch-equal).
Per-key state is the list of event timestamps within ``window_seconds``
of the key's max seen timestamp — the irreducible state for an exact
trailing count (state size = events per window per key, bounded by the
key's rate x window span; the watermark bounds how long an idle key's
state survives).

Cross-batch: a row arriving at-or-after ``max_seen - window`` (the
in-order guarantee the watermark enforces for built-in windowed
aggregates too) gets the exact count; on a single ``availableNow``
drain the output equals the batch operator row-for-row
(pytest-asserted, and hash-pinned in the ``window_analytics`` oracle
row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_validation_engine_spark.errors import ConfigurationError


def streaming_rolling_counts(
    sdf: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    window_seconds: float,
    watermark: str = "1 hour",
):
    """Per-key trailing-window event counts as a custom stateful
    streaming operator. Emits ``(<key_col>, event_ts_us, n_window)``; the
    key column keeps its input name and type; ``event_ts_us`` is integer
    epoch-microseconds (``timestamp_micros()`` recovers the instant).
    Timestamp arithmetic happens JVM-side (``unix_micros``) before the
    Python hop — the Arrow/pandas datetime conversion respects the driver
    session timezone and is therefore not environment-invariant
    (sessions.py documents the failure mode); longs are.
    """
    if not sdf.isStreaming:
        raise ConfigurationError(
            "streaming_rolling_counts requires a streaming DataFrame; use "
            "llmops.analytics.rolling_agg for batch frames"
        )
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    win_us = int(round(float(window_seconds) * 1_000_000))

    def count_windows(key, pdfs, state):
        from bisect import bisect_left, bisect_right

        import pandas as pd

        (k,) = key
        hist: list[int] = list(state.get[0]) if state.exists else []
        # one concat + one sort per key: chunks arrive in shuffle order
        # (same multi-chunk hazard sessions.py documents)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values("__ts_us", kind="mergesort")
        batch_us = [int(t) for t in pdf["__ts_us"].tolist()]
        # merged timeline: state is already sorted; batch is sorted; the
        # count for each batch row is a closed-interval slice of it
        merged = sorted(hist + batch_us)
        counts = [
            bisect_right(merged, t) - bisect_left(merged, t - win_us)
            for t in batch_us
        ]
        if merged:
            horizon = merged[-1] - win_us
            state.update((
                [t for t in merged if t >= horizon],
            ))
        yield pd.DataFrame(
            {
                key_col: [k] * len(batch_us),
                "event_ts_us": batch_us,
                "n_window": counts,
            }
        )

    out_schema = StructType(
        [
            StructField(key_col, sdf.schema[key_col].dataType),
            StructField("event_ts_us", LongType()),
            StructField("n_window", LongType()),
        ]
    )
    return (
        sdf.withWatermark(ts_col, watermark)
        .withColumn(
            "__ts_us", F.unix_micros(F.col(ts_col).cast("timestamp"))
        )
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            count_windows,
            outputStructType=out_schema,
            stateStructType="ts_micros array<bigint>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
