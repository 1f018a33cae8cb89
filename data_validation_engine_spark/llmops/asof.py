"""As-of (point-in-time) join — the feature-store / training-data join
Spark lacks natively.

``asof_join(left, right, ...)`` attaches to every left row the single
most recent right row whose timestamp is at-or-before the left row's,
per key: "what was this user's last known state when the event
happened". The canonical uses at 100 TB are feature materialisation
(events x slowly-changing feature snapshots) and leakage-safe label
construction (a training example may only see state from its past).

Implementation is the scale-shape Spark formulation — a tagged UNION and
one keyed window, never a range join:

1. tag left rows 1 / right rows 0, union by name (right's value columns
   ride along, null on left rows);
2. one window per key ordered by (ts, tag): ``last(value, ignorenulls)``
   over unbounded-preceding..current carries the latest right-side state
   forward onto each left row (tag order makes an equal-timestamp right
   row visible to the left row — "at-or-before" is inclusive);
3. keep left rows.

Cost: ONE shuffle of |left| + |right| rows on the key — no range-join
explosion, no per-key collect. Skew = per-key row volume, the same
exposure as any keyed window (sessionization shares it). DuckDB's native
``ASOF JOIN`` provides the independent oracle for the driver gate.

Public-knowledge provenance: the union-then-carry-forward formulation is
the standard gaps-and-islands-family SQL technique (same device as
``streaming/sessions.py``); DuckDB ASOF JOIN semantics are documented
public SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ts_seconds(col: Column, dtype: T.DataType) -> Column:
    """Timestamp-or-numeric column as epoch/raw seconds (double) — NTZ
    casts through TIMESTAMP first (wall-clock identity under a UTC
    session), numerics pass straight through."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return F.unix_micros(col.cast("timestamp")) / F.lit(1e6)
    return col.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    *,
    left_ts: str,
    right_ts: str | None = None,
    value_cols: list[str] | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance: int | float | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``prefix``-named copies
    of ``value_cols`` (and ``<prefix><right_ts>``) from the latest
    ``right`` row with ``right.ts <= left.ts`` sharing ``on``
    (``direction="backward"``, the default) — or the EARLIEST right row
    with ``right.ts >= left.ts`` (``direction="forward"``, e.g.
    next-event labelling).

    ``tolerance`` (same units as the timestamp columns — seconds for
    timestamps, raw difference for numeric ts) nulls out matches staler
    than the cap: a feature older than the staleness budget is treated
    as missing, the standard feature-store guard.

    Unmatched left rows keep nulls (LEFT semantics). Equal timestamps
    match (inclusive both directions). If several right rows share a
    key+timestamp the LAST in ``right_ts``-then-input order wins — make
    the right side unique per (key, ts) for full determinism, as with
    any as-of implementation.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}"
        )
    on = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (*on, right_ts)
        ]
    carried = [right_ts, *value_cols]
    out_names = {c: f"{prefix}{c}" for c in carried}
    clash = set(out_names.values()) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof output columns {sorted(clash)} collide with left-side "
            f"columns; pass a different prefix"
        )

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_names[c])
          for c in carried],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in on else F.col(c)
          for c in left.columns],
        *[F.col(c).alias(out_names[c]) for c in carried],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
    )
    # backward: ascending ts, so "last right row seen" = latest <= ts.
    # forward: DESCENDING ts, so "last right row seen" = earliest >= ts.
    # Either way the right row sorts before the left row at equal ts
    # (__is_left asc), making the boundary inclusive.
    ts_order = (
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried_fwd = l_tagged.unionByName(r_tagged).select(
        *[c for c in left.columns],
        "__is_left",
        *[
            F.last(F.col(out_names[c]), ignorenulls=True)
            .over(w)
            .alias(out_names[c])
            for c in carried
        ],
    )
    out = carried_fwd.where(F.col("__is_left") == 1).drop("__is_left")
    if tolerance is not None:
        lag = _ts_seconds(
            F.col(left_ts), left.schema[left_ts].dataType
        ) - _ts_seconds(
            F.col(out_names[right_ts]), right.schema[right_ts].dataType
        )
        if direction == "forward":
            lag = -lag
        within = lag <= F.lit(float(tolerance))
        # a match staler than the budget is MISSING, not approximate:
        # null every carried column together
        out = out.select(
            *[c for c in left.columns],
            *[
                F.when(within, F.col(out_names[c]))
                .otherwise(F.lit(None))
                .alias(out_names[c])
                for c in carried
            ],
        )
    return out
