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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    *,
    left_ts: str,
    right_ts: str | None = None,
    value_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``prefix``-named copies
    of ``value_cols`` (and ``<prefix><right_ts>``) from the latest
    ``right`` row with ``right.ts <= left.ts`` sharing ``on``.

    Unmatched left rows keep nulls (LEFT semantics). Equal timestamps
    match ("at-or-before" is inclusive). If several right rows share a
    key+timestamp the LAST in ``right_ts``-then-input order wins — make
    the right side unique per (key, ts) for full determinism, as with
    any as-of implementation.
    """
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
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
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
    return carried_fwd.where(F.col("__is_left") == 1).drop("__is_left")
