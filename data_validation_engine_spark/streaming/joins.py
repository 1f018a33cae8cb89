"""Stream-stream event-time interval joins.

The remaining Structured Streaming join surface after the stream-static
joins in :mod:`streaming.filters`: joining two LIVE streams (the
attribution shape — purchases against the clicks that preceded them,
submissions against their acknowledgements). Spark buffers both sides in
state; the watermark plus an explicit event-time range condition is what
lets it EVICT state, so this helper refuses to build an unbounded-state
join rather than let one degrade silently in production.

Scale shape: state per key is bounded by the interval width times the
per-key event rate; matching is a co-partitioned symmetric hash join on
the keys (both sides shuffle once on arrival, the canonical
stream-stream plan). Batch parity holds by construction — the same join
condition over the same data as static frames gives the identical row
set — and the oracle row pins it through the DuckDB twin.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_interval_join"]

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str] | str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: float,
    upper_seconds: float,
    watermark: str,
    prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on equal keys where the right event's time lies
    in ``[left_ts - lower_seconds, left_ts + upper_seconds]`` (closed).

    Right-side columns are returned renamed ``{prefix}{name}`` so the
    output schema is unambiguous. Both sides get ``watermark`` on their
    event-time column — combined with the range condition, Spark can
    drop buffered state older than the horizon instead of holding every
    event forever. ``how`` supports the inner join and the outer
    variants Spark allows for stream-stream joins (left/right outer need
    the watermark to know when an unmatched row is final).

    Works identically on batch frames (watermarks are a no-op there), so
    batch parity is testable by construction.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not keys:
        raise ValueError("stream_interval_join needs at least one key")
    if lower_seconds < 0 or upper_seconds < 0:
        raise ValueError(
            "lower/upper_seconds are non-negative widths; got "
            f"({lower_seconds}, {upper_seconds})"
        )
    for name in [*keys, left_ts, right_ts]:
        if not _IDENT.match(name):
            raise ValueError(f"not a plain column identifier: {name}")
    clash = [c for c in left.columns if c.startswith(prefix)]
    if clash:
        raise ValueError(
            f"left columns collide with the right-side prefix "
            f"{prefix!r}: {clash}; pass a different prefix"
        )
    lw = left.withWatermark(left_ts, watermark)
    rw = right.select(
        *[F.col(c).alias(f"{prefix}{c}") for c in right.columns]
    ).withWatermark(f"{prefix}{right_ts}", watermark)
    cond = None
    for k in keys:
        clause = lw[k] == rw[f"{prefix}{k}"]
        cond = clause if cond is None else (cond & clause)
    # interval literals take integral microseconds: exact for any float
    # seconds input, and immune to locale/format parsing
    lo_us = int(round(lower_seconds * 1_000_000))
    hi_us = int(round(upper_seconds * 1_000_000))
    rts = f"{prefix}{right_ts}"
    cond = (
        cond
        & (
            F.col(rts)
            >= F.col(left_ts) - F.expr(f"INTERVAL {lo_us} MICROSECOND")
        )
        & (
            F.col(rts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {hi_us} MICROSECOND")
        )
    )
    return lw.join(rw, cond, how)
