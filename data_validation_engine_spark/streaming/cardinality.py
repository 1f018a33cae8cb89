"""Streaming cardinality estimation: windowed KMV distinct counts with
BOUNDED state.

``COUNT(DISTINCT x)`` per event-time window is the canonical
unbounded-state streaming trap: exact distinct requires remembering every
value seen in the window, so a hot window's state grows without limit.
The KMV sketch (`llmops/sketch.py`) is the standard fix — O(k) state per
window regardless of cardinality — and because the sketch is MERGEABLE
(union of min-k sets, re-cut at k), it folds incrementally across
micro-batches: each batch merges its values' hashes into the window's
k-smallest set and re-cuts.

This is the third custom stateful operator built on
``applyInPandasWithState`` (after sessionization and trailing rolling
counts). The md5 hashing runs JVM-side BEFORE the stateful hop
(`kmv_hash` — the same 60-bit space as batch), so Python only merges
sorted long lists: the Arrow boundary carries ``(window_start, hash)``
pairs, never values.

Parity: on a single ``availableNow`` drain the final emission per window
equals the BATCH ``kmv_distinct`` grouped by the same window bucket,
field-for-field including the estimate (pytest-asserted) — the
merge-equals-global law the batch ``kmv_merge`` tests pin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_validation_engine_spark.errors import ConfigurationError
from data_validation_engine_spark.llmops.sketch import (
    DEFAULT_K,
    HASH_SPACE,
    kmv_hash,
)


def window_start_col(ts_col: Column, window_seconds: int) -> Column:
    """Tumbling-window start (epoch seconds, floor bucketing)."""
    sec = F.unix_timestamp(ts_col)
    w = int(window_seconds)
    return (F.floor(sec / w) * w).cast("bigint")


def streaming_kmv_distinct(
    sdf: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    window_seconds: int = 3600,
    k: int = DEFAULT_K,
    seed: str = "",
    watermark: str = "1 hour",
):
    """Approximate distinct ``value_col`` per tumbling event-time window.

    Emits ``(window_start, n_seen, kth_hash, approx_distinct)`` per
    window per micro-batch (append mode; the last emission for a window
    is its final sketch — one emission per window on an availableNow
    drain). State per window: at most ``k`` 8-byte hashes.
    """
    if not sdf.isStreaming:
        raise ConfigurationError(
            "streaming_kmv_distinct requires a streaming DataFrame; use "
            "llmops.sketch.kmv_distinct for batch frames"
        )
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    # watermarks require TIMESTAMP (with zone); NTZ sources cast through
    # the session zone — identical window buckets to the batch path,
    # which runs unix_timestamp on the same session zone
    sdf = sdf.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    hashed = (
        sdf.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col),
            window_start_col(F.col(ts_col), window_seconds).alias("__win"),
            kmv_hash(F.col(value_col), seed=seed).alias("__hv"),
        )
        # NULL values hash to NULL; COUNT(DISTINCT) ignores them, and an
        # unfiltered NULL would crash int() inside the stateful merge —
        # drop JVM-side so one bad record can't kill the stream
        .where(F.col("__hv").isNotNull())
    )

    def merge_sketch(key, pdfs, state):
        import pandas as pd

        (win,) = key
        if state.hasTimedOut:
            # watermark passed the window end: no more rows can arrive,
            # the final sketch was already emitted — free the state (the
            # window-keyed state space otherwise grows with wall clock)
            state.remove()
            return
        kept: list[int] = list(state.get[0]) if state.exists else []
        seen = set(kept)
        for pdf in pdfs:
            seen.update(int(h) for h in pdf["__hv"])
        merged = sorted(seen)[:k]
        state.update((merged,))
        # evict once the watermark passes the window close (epoch ms);
        # a late row for an already-closed window must not set a timeout
        # behind the current watermark (Spark rejects that), so clamp
        close_ms = (int(win) + int(window_seconds)) * 1000
        state.setTimeoutTimestamp(
            max(close_ms, state.getCurrentWatermarkMs() + 1)
        )
        n_seen = len(merged)
        if n_seen < k:
            est = float(n_seen)
            kth = None
        else:
            kth = merged[k - 1]
            est = float(k - 1) * HASH_SPACE / kth
        yield pd.DataFrame(
            {
                "window_start": [win],
                "n_seen": [n_seen],
                "kth_hash": pd.array([kth], dtype="Int64"),
                "approx_distinct": [est],
            }
        )

    out_schema = StructType(
        [
            StructField("window_start", LongType()),
            StructField("n_seen", LongType()),
            StructField("kth_hash", LongType()),
            StructField("approx_distinct", DoubleType()),
        ]
    )
    return hashed.groupBy(F.col("__win")).applyInPandasWithState(
        merge_sketch,
        outputStructType=out_schema,
        stateStructType="hashes array<bigint>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_cms_cells(
    sdf: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    window_seconds: int = 3600,
    depth: int = 4,
    width: int = 1024,
    seed: str = "",
    watermark: str = "1 hour",
):
    """Count-Min sketch cells per tumbling event-time window — the
    frequency companion to :func:`streaming_kmv_distinct`.

    Unlike KMV's min-k set, CMS cell counts are plain SUMS, so no
    custom stateful operator is needed at all: the md5 cell assignment
    (`llmops/sketch.py::cms_build`) runs as a per-row projection and
    Spark's native windowed aggregation maintains the partial sums in
    the state store — at most ``depth * width`` state rows per window
    regardless of value cardinality (the exact property that makes
    per-window heavy-hitter counting viable on an unbounded stream).
    Update mode (cells revise as batches land); after a drain, the
    final cells equal batch ``cms_build`` grouped by the same window
    bucket (pytest parity), so the persisted table is query-compatible
    with ``cms_query`` using ``window_start`` as a group column.
    """
    from data_validation_engine_spark.llmops.sketch import _cms_col

    if depth <= 0 or width <= 0:
        raise ConfigurationError("depth and width must be positive")
    # group by a REAL window() struct (not a derived bucket column) so
    # the watermark can evict closed windows from the state store
    cells = sdf.withWatermark(ts_col, watermark).select(
        F.col(ts_col).alias("__ts"),
        F.explode(
            _cms_col(F.col(value_col), depth, width, seed)
        ).alias("__cell"),
    )
    return (
        cells.groupBy(
            F.window(F.col("__ts"), f"{int(window_seconds)} seconds"),
            F.col("__cell")["row"].alias("row"),
            F.col("__cell")["col"].alias("col"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("window")["start"]).alias(
                "window_start"
            ),
            "row",
            "col",
            "n",
        )
    )


def streaming_paragraph_frequency(
    sdf: DataFrame,
    ts_col: str,
    text_col: str,
    *,
    window_seconds: int = 3600,
    sep: str = "\n",
    min_chars: int = 1,
    normalize: bool = True,
    watermark: str = "1 hour",
):
    """Paragraph-frequency table per tumbling event-time window — the
    streaming lift of :func:`~...llmops.paragraphs.paragraph_frequency`
    for CONTINUOUS ingestion: boilerplate (nav/footer/cookie lines)
    shows up as a hash whose count explodes within a window, and the
    drained table is exactly what ``remove_repeated_paragraphs``-style
    cleaning joins against on the next batch pass.

    Like :func:`streaming_cms_cells`, no custom stateful operator is
    needed: the paragraph explode + md5 is a per-row projection and the
    count is a native watermarked windowed aggregation — state is one
    row per (window, distinct paragraph hash), evicted when the
    watermark closes the window. Emits ``(window_start, h, para,
    n_occ)`` with ``para`` the min original text (same deterministic
    representative as the batch operator). ``n_occ`` counts
    OCCURRENCES — a distinct-document count is not expressible as a
    streaming aggregation without a second shuffle of per-doc state;
    for boilerplate detection occurrence counts are the signal anyway
    (the batch operator remains the exact n_docs source).

    After an ``availableNow`` drain the emitted windows equal the batch
    group-by restricted to windows closed by the final watermark —
    pytest parity, same discipline as every streaming arm.
    """
    from data_validation_engine_spark.llmops.paragraphs import _norm_col

    if window_seconds <= 0:
        raise ConfigurationError("window_seconds must be positive")
    paras = sdf.withWatermark(ts_col, watermark).select(
        F.col(ts_col).alias("__ts"),
        F.explode(
            F.split(F.col(text_col), F.lit(sep), -1)
        ).alias("para"),
    ).where(F.length(F.trim(F.col("para"))) >= int(min_chars)).select(
        "__ts",
        "para",
        F.md5(_norm_col(F.col("para"), normalize=normalize)).alias("h"),
    )
    return (
        paras.groupBy(
            F.window(F.col("__ts"), f"{int(window_seconds)} seconds"),
            F.col("h"),
        )
        .agg(
            F.min("para").alias("para"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .select(
            F.unix_timestamp(F.col("window")["start"]).alias(
                "window_start"
            ),
            "h",
            "para",
            "n_occ",
        )
    )
