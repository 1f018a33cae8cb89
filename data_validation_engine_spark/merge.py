"""Incremental table maintenance: MERGE-style upsert and CDC apply.

The reference engine re-validates full snapshots per submission
(``/root/reference/src/dve/pipeline/pipeline.py`` polls a landing prefix
and processes whole files); production pipelines at 100 TB instead
receive DELTAS — a small batch of changed rows against a huge validated
base. These operators give that incremental path first-class, declarable
semantics (ANSI ``MERGE INTO`` / CDC ``APPLY CHANGES``) built purely from
equi-joins, so Catalyst can broadcast the (typically tiny) delta and the
base table never shuffles:

- :func:`merge_upsert` — SQL MERGE: update matched rows, insert unmatched
  ones. The base side's plan is one join keyed on the merge keys; when the
  delta is broadcast-able (the normal case) the base is a single
  map-side pass.
- :func:`apply_changes` — CDC ledger application: collapse an
  insert/update/delete change stream to its latest state per key, then
  merge it (deletes drop rows).

Both are deterministic under concurrent duplicate keys only when given a
``sequence_col`` (latest wins; remaining columns break exact ties) —
without one, duplicate update keys are the caller's contract violation
and fail loudly rather than picking a partition-dependent winner.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "merge_upsert",
    "apply_changes",
    "latest_per_key",
    "snapshot_diff",
    "scd2_from_ledger",
    "scd2_snapshot",
]

_MATCH_FLAG = "__dve_upd_matched"


def _check_keys(df: DataFrame, keys: list[str], side: str) -> None:
    missing = [k for k in keys if k not in df.columns]
    if missing:
        raise ValueError(f"merge keys missing from {side}: {missing}")


def latest_per_key(
    df: DataFrame,
    keys: list[str],
    sequence_col: str,
) -> DataFrame:
    """Collapse to the single latest row per key by ``sequence_col``
    descending, remaining columns ascending as the deterministic
    tiebreak (so exact sequence ties cannot flip winners between runs
    or partitionings; NULLS LAST on the tiebreak columns — the ANSI
    ascending default — so a DuckDB/ANSI replay of the same ORDER BY
    picks the same winner even when tied rows carry NULLs). One shuffle
    on the keys; WindowGroupLimit keeps only the running top-1 per
    partition before the final rank."""
    if sequence_col not in df.columns:
        raise ValueError(f"sequence column not in frame: {sequence_col}")
    others = [
        c for c in df.columns if c not in keys and c != sequence_col
    ]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(sequence_col).desc(),
        *[F.col(c).asc_nulls_last() for c in others],
    )
    rank = "__dve_seq_rank"
    if rank in df.columns:
        raise ValueError(f"input column collides with helper name: {rank}")
    return (
        df.withColumn(rank, F.row_number().over(w))
        .where(F.col(rank) == 1)
        .drop(rank)
    )


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str] | str,
    *,
    update_cols: list[str] | None = None,
    sequence_col: str | None = None,
    insert_missing: bool = True,
) -> DataFrame:
    """ANSI ``MERGE INTO`` as a DataFrame transform: rows of ``base``
    whose key appears in ``updates`` take the update's values for
    ``update_cols`` (NULL in an update means SET NULL, not keep — SQL
    MERGE semantics); unmatched update rows are inserted (base-only
    columns NULL-filled) unless ``insert_missing=False``; all other base
    rows pass through untouched.

    - ``update_cols`` defaults to every non-key update column; it may be
      a subset (partial-column updates), but every update column must
      already exist on ``base`` — schema widening is a different
      operation and is rejected loudly.
    - ``sequence_col`` (an updates-side column, never written to the
      output) collapses duplicate update keys to the latest row first
      via :func:`latest_per_key`. Without it, duplicate keys in
      ``updates`` would multiply matched base rows, so they are rejected
      with a lazy guard compiled into the plan (fails the action, costs
      no extra job).
    - NULL key values follow SQL equality: they never match, so a
      NULL-keyed update row inserts (its own contract problem to filter
      upstream; the behaviour is documented rather than hidden).

    Scale shape: the base table NEVER shuffles when the delta is
    broadcast-able (the normal 100 TB case). Updates + pass-through are
    one equi-join of base against the delta. Inserts avoid the naive
    ``delta ANTI base`` (which would shuffle the base's key column) by
    first semi-joining base's keys against the broadcast delta keys —
    a result bounded by the delta size — then anti-joining the delta
    against THAT broadcast-able matched set: two key-pruned base scans,
    zero base shuffles. With a delta too large to broadcast, AQE
    degrades every join to co-partitioned shuffles on the keys — the
    honest fallback.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not keys:
        raise ValueError("merge_upsert needs at least one key column")
    _check_keys(base, keys, "base")
    _check_keys(updates, keys, "updates")
    if _MATCH_FLAG in base.columns or _MATCH_FLAG in updates.columns:
        raise ValueError(
            f"input column collides with helper name: {_MATCH_FLAG}"
        )

    if sequence_col is not None:
        updates = latest_per_key(updates, keys, sequence_col).drop(
            sequence_col
        )

    upd_value_cols = [c for c in updates.columns if c not in keys]
    if update_cols is None:
        update_cols = upd_value_cols
    else:
        update_cols = list(update_cols)
        missing = [c for c in update_cols if c not in upd_value_cols]
        if missing:
            raise ValueError(
                f"update_cols not present on updates (or are keys): "
                f"{missing}"
            )
    widening = [c for c in updates.columns if c not in base.columns]
    if widening:
        raise ValueError(
            f"updates carry columns unknown to base {widening}; "
            "merge_upsert never widens the base schema"
        )

    if sequence_col is None:
        # lazy duplicate-key guard: a duplicated update key would silently
        # multiply its matched base row (or insert twice when the key is
        # absent from base); make the plan itself refuse. The guard wraps
        # the first KEY column so BOTH the update join and the insert
        # path must evaluate it — guarding a side-channel flag column
        # would let column pruning skip the check on the insert branch.
        # count(*) over the key window is a no-op for unique keys and
        # raises at action time otherwise — no separate validation job.
        w = Window.partitionBy(*[F.col(k) for k in keys])
        k0 = keys[0]
        updates = updates.withColumn(
            k0,
            F.when(
                F.count(F.lit(1)).over(w) == 1, F.col(k0)
            ).otherwise(
                F.raise_error(
                    F.lit(
                        "merge_upsert: duplicate update keys; pass "
                        "sequence_col to collapse them deterministically"
                    )
                ).cast(updates.schema[k0].dataType)
            ),
        )

    upd = updates.select(
        *keys, *update_cols, F.lit(True).alias(_MATCH_FLAG)
    )

    aliased_upd = upd.select(
        *[F.col(k).alias(f"__u_{k}") for k in keys],
        *[F.col(c).alias(f"__u_{c}") for c in update_cols],
        F.col(_MATCH_FLAG),
    )
    cond = None
    for k in keys:
        clause: Column = base[k] == F.col(f"__u_{k}")
        cond = clause if cond is None else (cond & clause)

    merged = base.join(aliased_upd, cond, "left").select(
        *[
            (
                F.when(
                    F.col(_MATCH_FLAG).isNotNull(), F.col(f"__u_{c}")
                ).otherwise(base[c])
                if c in update_cols
                else base[c]
            ).alias(c)
            for c in base.columns
        ]
    )
    if not insert_missing:
        return merged

    # keys of the delta that DO exist in base: base scans its (pruned)
    # key columns and probes the delta — never shuffling base; the
    # distinct bounds the result by the delta's key count so the anti
    # join below can broadcast it
    matched_keys = (
        base.select(*keys)
        .join(updates.select(*keys), keys, "left_semi")
        .distinct()
    )
    inserts = updates.join(matched_keys, keys, "left_anti").select(
        *[
            F.col(c) if c in updates.columns
            else F.lit(None).cast(base.schema[c].dataType).alias(c)
            for c in base.columns
        ]
    )
    return merged.unionByName(inserts)


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str] | str,
    *,
    op_col: str = "op",
    sequence_col: str | None = None,
    upsert_ops: tuple[str, ...] = ("I", "U"),
    delete_ops: tuple[str, ...] = ("D",),
) -> DataFrame:
    """Apply a CDC change ledger to ``base``: collapse the ledger to its
    LATEST change per key (``sequence_col``, required whenever a key can
    change more than once per batch), then upsert the surviving
    inserts/updates and anti-join away the surviving deletes.

    An unknown ``op_col`` value fails the action loudly (a typo'd op
    silently dropped is a correctness hole). Delete-then-reinsert within
    one batch resolves to whichever is latest — exactly the ledger's
    meaning. Scale shape: :func:`merge_upsert`'s single-join plan plus
    one anti-join on the (small) delete set.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if op_col not in changes.columns:
        raise ValueError(f"op column not in changes: {op_col}")
    known = list(upsert_ops) + list(delete_ops)
    guarded = changes.withColumn(
        op_col,
        F.when(F.col(op_col).isin(known), F.col(op_col)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"apply_changes: unknown {op_col} value: "),
                    # NULL op must still raise WITH a readable message
                    # (concat of NULL would null the whole error string)
                    F.coalesce(
                        F.col(op_col).cast("string"), F.lit("NULL")
                    ),
                )
            ).cast("string")
        ),
    )
    if sequence_col is not None:
        guarded = latest_per_key(guarded, keys, sequence_col).drop(
            sequence_col
        )
    upserts = guarded.where(F.col(op_col).isin(list(upsert_ops))).drop(
        op_col
    )
    deletes = guarded.where(F.col(op_col).isin(list(delete_ops))).select(
        *keys
    )
    # the ledger is now at most one row per key (collapsed above, or the
    # caller's single-change-per-batch contract — merge_upsert's lazy
    # duplicate guard enforces the latter)
    merged = merge_upsert(base, upserts, keys)
    return merged.join(deletes, keys, "left_anti")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str] | str,
    *,
    op_col: str = "op",
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Derive the CDC ledger between two snapshots — the inverse of
    :func:`apply_changes`: one row per key whose state differs, with
    ``op_col`` = 'I' (key only in ``new``), 'D' (only in ``old``), or
    'U' (present in both with any compared column differing, NULL-safe).
    Unchanged keys emit nothing — at 100 TB you materialise the DELTA,
    never the cross product of snapshots. Row values come from the NEW
    side ('D' rows carry the keys with non-key columns NULL).

    Round-trip law (property-tested): ``apply_changes(old,
    snapshot_diff(old, new, keys), keys) == new`` whenever keys are
    unique per snapshot. The validation use: regression-diff
    yesterday's validated entities against today's — profile_diff tells
    you the SCHEMA drifted, this tells you exactly WHICH rows.

    Scale shape: one full-outer co-partitioned join on the keys (the
    irreducible cost of any exact diff); the change test is a per-row
    null-safe comparison, no second pass. Both snapshots must share the
    compared columns. Key values must be NON-NULL, enforced with a lazy
    in-plan guard that fails the action: ``apply_changes``/``merge_upsert``
    match keys with SQL equality, so a NULL-keyed 'U'/'D' row could
    never match during apply and the round-trip law would silently turn
    updates into spurious inserts — better to refuse the diff loudly.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not keys:
        raise ValueError("snapshot_diff needs at least one key column")
    _check_keys(old, keys, "old snapshot")
    _check_keys(new, keys, "new snapshot")
    if op_col in old.columns or op_col in new.columns:
        raise ValueError(
            f"op column name collides with a snapshot column: {op_col}"
        )
    value_cols = compare_cols if compare_cols is not None else [
        c for c in new.columns if c not in keys
    ]
    missing = [
        c for c in value_cols if c not in old.columns or c not in new.columns
    ]
    if missing:
        raise ValueError(
            f"compared columns missing from a snapshot: {missing}"
        )
    def _nn_key(df: DataFrame, k: str, side: str) -> Column:
        # lazy NULL-key guard compiled into the plan: costs nothing for
        # clean data, fails the action with a readable message otherwise
        return F.when(F.col(k).isNotNull(), F.col(k)).otherwise(
            F.raise_error(
                F.lit(
                    f"snapshot_diff: NULL key value in {side}.{k}; "
                    "NULL-keyed rows cannot round-trip through "
                    "apply_changes (keys match with SQL equality)"
                )
            ).cast(df.schema[k].dataType)
        )

    o = old.select(
        *[_nn_key(old, k, "old").alias(f"__o_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in value_cols],
        F.lit(True).alias("__o_present"),
    )
    n = new.select(
        *[_nn_key(new, k, "new").alias(f"__n_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in value_cols],
        F.lit(True).alias("__n_present"),
    )
    cond = None
    for k in keys:
        clause = F.col(f"__o_{k}").eqNullSafe(F.col(f"__n_{k}"))
        cond = clause if cond is None else (cond & clause)
    joined = o.join(n, cond, "full_outer")
    changed = F.lit(False)
    for c in value_cols:
        changed = changed | ~F.col(f"__o_{c}").eqNullSafe(
            F.col(f"__n_{c}")
        )
    op = (
        F.when(F.col("__o_present").isNull(), F.lit("I"))
        .when(F.col("__n_present").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
    )
    return (
        joined.withColumn(op_col, op)
        .where(F.col(op_col).isNotNull())
        .select(
            F.col(op_col),
            *[
                F.coalesce(F.col(f"__n_{k}"), F.col(f"__o_{k}")).alias(k)
                for k in keys
            ],
            *[F.col(f"__n_{c}").alias(c) for c in value_cols],
        )
    )


def scd2_from_ledger(
    changes: DataFrame,
    keys: list[str] | str,
    *,
    sequence_col: str,
    op_col: str = "op",
    upsert_ops: tuple[str, ...] = ("I", "U"),
    delete_ops: tuple[str, ...] = ("D",),
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Build a slowly-changing-dimension TYPE 2 history table from a CDC
    ledger: one row per (key, version) with validity bounds in sequence
    units — the feature-store/warehouse companion to
    :func:`apply_changes` (which keeps only latest state, this keeps ALL
    states).

    Semantics: each upsert opens a version at its sequence; the version
    closes at the key's NEXT change (upsert or delete) and the last open
    version is current (``valid_to`` NULL). Delete changes close their
    predecessor's interval without opening one — the key simply has no
    current row while deleted. Unknown ops fail the action loudly (same
    guard as :func:`apply_changes`); duplicate (key, sequence) pairs are
    rejected in-plan, because two changes at one instant have no defined
    version order.

    Point-in-time reads: ``history.where((F.col('valid_from') <= s) &
    (F.col('valid_to').isNull() | (F.col('valid_to') > s)))`` — or use
    :func:`scd2_snapshot`, whose agreement with
    ``apply_changes(empty, ledger[seq <= s])`` is the property-tested
    consistency law.

    Scale shape: ONE shuffle on the keys (the lead window); everything
    else is a per-row projection. History size = ledger upsert count —
    no joins, no blow-up. All validity arithmetic is in the caller's
    integer sequence domain; nothing here floats.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not keys:
        raise ValueError("scd2_from_ledger needs at least one key column")
    _check_keys(changes, keys, "changes")
    if op_col not in changes.columns:
        raise ValueError(f"op column not in changes: {op_col}")
    if sequence_col not in changes.columns:
        raise ValueError(f"sequence column not in changes: {sequence_col}")
    for c in (valid_from_col, valid_to_col, current_col):
        if c in changes.columns:
            raise ValueError(
                f"output column collides with a ledger column: {c}"
            )
    known = list(upsert_ops) + list(delete_ops)
    guarded = changes.withColumn(
        op_col,
        F.when(F.col(op_col).isin(known), F.col(op_col)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"scd2_from_ledger: unknown {op_col} value: "),
                    F.coalesce(
                        F.col(op_col).cast("string"), F.lit("NULL")
                    ),
                )
            ).cast("string")
        ),
    )
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(sequence_col).asc()
    )
    # in-plan duplicate-(key, sequence) guard: version order would be
    # undefined. Folded into the SELECTED valid_from expression so column
    # pruning cannot optimise the check away; costs nothing for clean
    # ledgers.
    wdup = Window.partitionBy(
        *[F.col(k) for k in keys], F.col(sequence_col)
    )
    seq_guarded = F.when(
        F.count(F.lit(1)).over(wdup) == 1, F.col(sequence_col)
    ).otherwise(
        F.raise_error(
            F.lit(
                "scd2_from_ledger: duplicate (key, sequence) — two "
                "changes at one sequence have no version order"
            )
        ).cast(changes.schema[sequence_col].dataType)
    )
    nxt = F.lead(F.col(sequence_col)).over(w)
    return (
        guarded.withColumn("__dve_scd_from", seq_guarded)
        .withColumn(valid_to_col, nxt)
        .where(F.col(op_col).isin(list(upsert_ops)))
        .select(
            *keys,
            *[
                c
                for c in changes.columns
                if c not in keys and c not in (op_col, sequence_col)
            ],
            F.col("__dve_scd_from").alias(valid_from_col),
            F.col(valid_to_col),
            F.col(valid_to_col).isNull().alias(current_col),
        )
    )


def scd2_snapshot(
    history: DataFrame,
    as_of,
    *,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """The table state at sequence point ``as_of`` from a type-2 history:
    rows whose validity interval covers ``as_of`` (half-open
    ``[valid_from, valid_to)``; NULL ``valid_to`` = open). Zero-shuffle
    filter — at 100 TB, partition the history by ``valid_to IS NULL`` /
    date so point-in-time scans prune to the live slice.

    Consistency law (property-tested): equals ``apply_changes(empty,
    ledger[seq <= as_of])`` over the ledger the history was built from.

    ``as_of`` may be a literal or a Column (e.g. a broadcast scalar
    attached by crossJoin — the declarative form of "as of the latest
    closed period").
    """
    point = as_of if isinstance(as_of, Column) else F.lit(as_of)
    return history.where(
        (F.col(valid_from_col) <= point)
        & (
            F.col(valid_to_col).isNull()
            | (F.col(valid_to_col) > point)
        )
    ).drop(valid_from_col, valid_to_col, current_col)
