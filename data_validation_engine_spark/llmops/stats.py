"""Distribution-drift and grouped-regression statistics, engine-exact
by construction.

The float discipline (FLOATS.md): +, -, *, / and sqrt are IEEE
correctly-rounded — identical on every box and engine given identical
inputs — while transcendentals (ln/exp/pow) are libm-dependent. Both
operators here therefore aggregate EXACTLY first (integer counts;
DECIMAL(38,0) sums of integer-scaled measures) and only then apply a
short, fixed sequence of IEEE ops that a DuckDB twin replays verbatim.
Chi-square is emitted PER CELL (one division each) rather than as the
summed statistic, because a sum of divisions re-orders under
partitioning — the caller (or the oracle) sums the pinned cells.

Scale shapes: both are single wide aggregations (one shuffle on the
group/cell key); the drift join is on the tiny cell table, broadcast.
No reference counterpart (the reference has no statistics vocabulary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def chi2_drift(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """Per-cell chi-square contributions between two samples of a
    categorical ``column`` — the drift monitor for label / source /
    language composition between corpus snapshots.

    Uses the standard two-sample contingency formulation: for each
    value v with counts ``a`` (ref) and ``b`` (cur), expected counts
    are ``e_a = (a+b) * A / N`` and ``e_b = (a+b) * B / N`` where A, B
    are sample totals and N = A + B. Output per cell: ``(value, n_ref,
    n_cur, chi2_ref, chi2_cur)`` with ``chi2_x = (x - e_x)^2 / e_x``
    rounded to ``round_to``. The statistic is ``sum(chi2_ref +
    chi2_cur)`` with dof = cells - 1; the cells are pinned instead of
    the sum so the hashed surface has no float-accumulation order.

    Values absent from one side participate with count 0 (a full outer
    join on the cell key). NULLs count as their own cell.

    Degenerate-sample policy (explicit): if a side's TOTAL is zero (an
    empty snapshot) every expected count on that side is zero and the
    contribution ``d²/0`` is engine-divergent (Spark non-ANSI renders
    NULL, DuckDB inf) — an unacceptable edge in an operator whose whole
    point is engine-exactness. The contribution is therefore guarded:
    cells with a zero expected count emit NULL (pytest-pinned in
    tests/test_round9.py), so a chi-square against an empty snapshot is
    all-NULL rather than a crash or an inf.
    """
    a = ref.groupBy(
        F.col(column).cast("string").alias("__va")
    ).agg(F.count(F.lit(1)).alias("n_ref"))
    b = cur.groupBy(
        F.col(column).cast("string").alias("__vb")
    ).agg(F.count(F.lit(1)).alias("n_cur"))
    # null-safe cell match: the NULL category is one cell, not two
    cells = a.join(
        b, F.col("__va").eqNullSafe(F.col("__vb")), "full_outer"
    ).select(
        F.coalesce("__va", "__vb").alias("value"),
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    # totals are a 1-row broadcast; every per-cell float derives from
    # exact integers through one fixed IEEE expression
    totals = cells.agg(
        F.sum("n_ref").alias("tot_ref"), F.sum("n_cur").alias("tot_cur")
    )
    c = cells.crossJoin(F.broadcast(totals))
    row = F.col("n_ref") + F.col("n_cur")
    n = F.col("tot_ref") + F.col("tot_cur")
    e_ref = (
        row.cast("double")
        * F.col("tot_ref").cast("double")
        / n.cast("double")
    )
    e_cur = (
        row.cast("double")
        * F.col("tot_cur").cast("double")
        / n.cast("double")
    )

    def contrib(obs, exp):
        d = obs.cast("double") - exp
        return F.when(exp > 0, F.round(d * d / exp, round_to))

    return c.select(
        "value",
        "n_ref",
        "n_cur",
        contrib(F.col("n_ref"), e_ref).alias("chi2_ref"),
        contrib(F.col("n_cur"), e_cur).alias("chi2_cur"),
    )


def grouped_regression(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    *,
    scale: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Per-group ordinary-least-squares line and correlation, exact up
    to the final closed-form division.

    x and y are scaled to integers (``round(v * scale)``) and summed as
    DECIMAL(38,0) — exact in any partitioning/order — then the five
    sums convert once to double and the textbook formulas run as a
    fixed IEEE sequence:

        slope = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²)      [scaled domain]
        intercept = (Sy − slope·Sx) / n
        corr  = (n·Sxy − Sx·Sy) / (sqrt(n·Sxx − Sx²)·sqrt(n·Syy − Sy²))

    Output: group cols + ``(n, sx, sy, sxy, sxx, syy)`` as exact
    DECIMAL(38,0) (the auditable sufficient statistics — mergeable
    across shards by plain addition) + ``slope``/``intercept`` (in the
    scaled-integer domain) and ``corr`` (scale-invariant), each rounded
    to ``round_to``. Groups with a degenerate x-variance emit NULL
    slope/intercept/corr. One shuffle (the group agg).
    """
    xs = F.round(F.col(x_col) * F.lit(int(scale))).cast("decimal(38,0)")
    ys = F.round(F.col(y_col) * F.lit(int(scale))).cast("decimal(38,0)")
    agg = df.select(
        *group_cols,
        xs.alias("__x"),
        ys.alias("__y"),
    ).groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = F.when(var_x > 0, F.round(cov_n / var_x, round_to))
    intercept = F.when(
        var_x > 0, F.round((sy - (cov_n / var_x) * sx) / n, round_to)
    )
    corr = F.when(
        (var_x > 0) & (var_y > 0),
        F.round(cov_n / (F.sqrt(var_x) * F.sqrt(var_y)), round_to),
    )
    return agg.select(
        *group_cols,
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        "syy",
        slope.alias("slope"),
        intercept.alias("intercept"),
        corr.alias("corr"),
    )


def ecdf_normalize(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: list[str] | None = None,
    out_col: str = "ecdf",
    round_to: int = 9,
) -> DataFrame:
    """Empirical-CDF score normalization: each row gains ``ecdf`` =
    P(value <= v) within its group — the rank-based calibration that
    makes quality scores comparable across heterogeneous sources before
    a global keep-threshold is applied.

    Scale shape — deliberately NOT ``percent_rank`` over the raw rows
    (that is a total sort of the corpus per group): the counts collapse
    to one row per DISTINCT value first (one group+value-keyed
    aggregation), the cumulative sum runs over that far smaller frame,
    and the result joins back on the same (group, value) key the
    aggregation produced, so AQE reuses the partitioning. Ties share an
    ecdf by construction. Exact integers until the single final
    division (``cum / n``), rounded to ``round_to``.

    NULL policy (explicit): a NULL in ``value_col`` or any group column
    FAILS the action with a readable message. A NULL value has no rank
    (engines even disagree on its sort position — Spark windows default
    NULLS FIRST, ANSI/DuckDB NULLS LAST), and the equi-join-back would
    silently drop the row; filter or impute before calibrating. The
    guard is compiled into the plan (zero cost on clean data), the same
    lazy ``raise_error`` idiom the MERGE/diff operators use.
    """
    groups = list(group_cols or [])

    def _nn(c: str) -> Column:
        return F.when(F.col(c).isNotNull(), F.col(c)).otherwise(
            F.raise_error(
                F.lit(
                    f"ecdf_normalize: NULL in column '{c}'; a NULL has "
                    "no rank and would be dropped by the join-back — "
                    "filter or impute before calibrating"
                )
            ).cast(df.schema[c].dataType)
        )

    guarded = df.select(
        *[
            _nn(c).alias(c) if c in {value_col, *groups} else F.col(c)
            for c in df.columns
        ]
    )
    counts = guarded.groupBy(
        *groups, F.col(value_col).alias("__v")
    ).agg(F.count(F.lit(1)).alias("__c"))
    w = (
        Window.partitionBy(*groups)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*groups)
    cdf = counts.select(
        *groups,
        "__v",
        F.round(
            F.sum("__c").over(w).cast("double")
            / F.sum("__c").over(wn).cast("double"),
            round_to,
        ).alias(out_col),
    )
    return guarded.join(
        cdf.withColumnRenamed("__v", value_col), [*groups, value_col]
    )


def merge_regression_stats(
    a: DataFrame, b: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Merge two :func:`grouped_regression` outputs by adding their
    exact sufficient statistics and re-deriving the floats — the
    incremental-maintenance path: yesterday's stats + today's shard
    without touching yesterday's rows. Exact because the sums are
    DECIMAL(38,0) (order- and split-independent); the float formulas
    are the identical fixed IEEE sequence, so merge(a, b) equals
    recomputing over the union (property-tested).
    """
    stats = ["n", "sx", "sy", "sxy", "sxx", "syy"]
    sides = a.select(*group_cols, *stats).unionByName(
        b.select(*group_cols, *stats)
    )
    agg = sides.groupBy(*group_cols).agg(
        *[F.sum(c).cast("decimal(38,0)").alias(c) for c in stats]
    )
    agg = agg.withColumn("n", F.col("n").cast("long"))
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    return agg.select(
        *group_cols,
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        "syy",
        F.when(var_x > 0, F.round(cov_n / var_x, 6)).alias("slope"),
        F.when(
            var_x > 0, F.round((sy - (cov_n / var_x) * sx) / n, 6)
        ).alias("intercept"),
        F.when(
            (var_x > 0) & (var_y > 0),
            F.round(cov_n / (F.sqrt(var_x) * F.sqrt(var_y)), 6),
        ).alias("corr"),
    )


def grouped_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-group ROC AUC of a score against a binary label — the
    validation statistic for quality classifiers and dedup scorers
    (does the score actually rank kept docs above dropped ones?).

    Mann-Whitney formulation with exact tie handling: rank all scores
    ascending with ties receiving the average rank, then
    ``AUC = (R_pos − n_pos(n_pos+1)/2) / (n_pos · n_neg)`` where
    ``R_pos`` is the positives' rank sum. All arithmetic stays integer
    until the single final division: average ranks are half-integers, so
    the DOUBLED rank sum ``2·R_pos = Σ pos_s · (2·cum_before_s + cnt_s
    + 1)`` over distinct scores is exact, engine-portable math.

    Scale shape (same discipline as :func:`ecdf_normalize`): counts
    collapse to one row per DISTINCT (group, score) first, the
    cumulative window runs over that far smaller frame, and the final
    statistic is one group-keyed aggregation — never a percent_rank
    sort of the raw corpus. Groups with only one class present emit
    NULL (AUC undefined), with ``n_pos``/``n_neg`` attesting why.

    NULL policy: NULL scores or labels FAIL the action loudly (a NULL
    has no rank; engines disagree where it sorts), the repo's
    raise_error guard idiom. ``label_col`` must be 0/1-valued —
    anything else fails the same way.
    """
    groups = list(group_cols or [])

    def _nn(c: str) -> Column:
        return F.when(F.col(c).isNotNull(), F.col(c)).otherwise(
            F.raise_error(
                F.lit(
                    f"grouped_auc: NULL in column '{c}' — a NULL has no "
                    "rank; filter or impute before scoring"
                )
            )
        )

    label = F.when(
        _nn(label_col).cast("long").isin(0, 1), F.col(label_col).cast("long")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"grouped_auc: non-binary label in '{label_col}': "),
                F.col(label_col).cast("string"),
            )
        )
    )
    per_score = (
        df.select(
            *[_nn(c).alias(c) for c in groups],
            _nn(score_col).alias("__s"),
            label.alias("__y"),
        )
        .groupBy(*groups, "__s")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.sum("__y").alias("__pos"),
        )
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in groups])
        .orderBy(F.col("__s"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = per_score.withColumn(
        "__cum_before", F.coalesce(F.sum("__cnt").over(w), F.lit(0))
    )
    agg = ranked.groupBy(*groups).agg(
        F.sum("__pos").alias("n_pos"),
        F.sum(F.col("__cnt") - F.col("__pos")).alias("n_neg"),
        F.sum(
            F.col("__pos")
            * (2 * F.col("__cum_before") + F.col("__cnt") + 1)
        ).alias("__r2"),
    )
    auc = (
        (
            F.col("__r2").cast("double")
            - F.col("n_pos").cast("double")
            * (F.col("n_pos") + 1).cast("double")
        )
        / 2.0
        / (F.col("n_pos").cast("double") * F.col("n_neg").cast("double"))
    )
    return agg.select(
        *groups,
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(auc, round_to),
        ).alias("auc"),
    )


def standardize(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: list[str] | None = None,
    method: str = "zscore",
    out_col: str = "scaled",
    ddof: int = 1,
    broadcast_stats: bool = True,
) -> DataFrame:
    """Feature scaling within each group (or globally): the calibration
    sibling of :func:`ecdf_normalize` for when the MAGNITUDE of a score
    matters, not just its rank.

    - ``"zscore"`` — ``(x - mean) / stddev`` (``ddof=1`` sample /
      ``0`` population); a zero-spread group scales to 0.0.
    - ``"minmax"`` — ``(x - min) / (max - min)`` into [0, 1]; a
      zero-range group scales to 0.0.
    - ``"robust"`` — ``(x - median) / IQR`` (exact type-7 percentiles,
      the same convention as ``grouped_quantiles``); zero IQR → 0.0.

    NULL values stay NULL (absence is not a zero score). Like
    ``lm_perplexity``, the output is a threshold-filter FEATURE, not an
    engine-exact hashed surface (float division). Scale shape: one
    map-side-combined aggregation over the group keys, joined back —
    the stats frame is one row per group; rows never re-sort.

    ``broadcast_stats`` (default True) hints the stats side of the
    join-back. One row per group is small for the usual calibration
    keys (language, source, shard), but per-domain or per-user scaling
    at 100 TB makes the stats frame itself multi-GB — pass
    ``broadcast_stats=False`` above ~10M groups so AQE picks the join
    strategy from the measured size instead of force-building a
    driver-sized hash table (same escape as ``bpe_encode``'s
    ``broadcast_words``).
    """
    if method not in ("zscore", "minmax", "robust"):
        raise ValueError(
            f"method must be zscore|minmax|robust, got {method!r}"
        )
    if ddof not in (0, 1):
        raise ValueError(f"ddof must be 0 or 1, got {ddof}")
    groups = list(group_cols or [])
    v = F.col(value_col).cast("double")
    if method == "zscore":
        std = F.stddev_samp(v) if ddof == 1 else F.stddev_pop(v)
        stats = df.groupBy(*groups).agg(
            F.avg(v).alias("__center"), std.alias("__spread")
        )
    elif method == "minmax":
        stats = df.groupBy(*groups).agg(
            F.min(v).alias("__center"),
            (F.max(v) - F.min(v)).alias("__spread"),
        )
    else:
        # percentile over the same casted column v the other methods
        # use (F.percentile, not a raw-interpolated F.expr: column
        # names needing backticks and string-typed numerics behave
        # identically across all three methods)
        stats = df.groupBy(*groups).agg(
            F.percentile(v, F.lit(0.5)).alias("__center"),
            (
                F.percentile(v, F.lit(0.75))
                - F.percentile(v, F.lit(0.25))
            ).alias("__spread"),
        )
    if groups:
        # eqNullSafe: a NULL group key is a real group to groupBy, and
        # an equality join would silently orphan its rows onto the
        # zero-spread branch (scaled=0.0 regardless of value)
        stats_r = stats.select(
            *[F.col(g).alias(f"__g_{g}") for g in groups],
            "__center",
            "__spread",
        )
        cond = None
        for g in groups:
            c = F.col(g).eqNullSafe(F.col(f"__g_{g}"))
            cond = c if cond is None else (cond & c)
        stats_side = F.broadcast(stats_r) if broadcast_stats else stats_r
        joined = df.join(stats_side, cond, "left").drop(
            *[f"__g_{g}" for g in groups]
        )
    else:
        joined = df.crossJoin(F.broadcast(stats))
    scaled = F.when(v.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(
            F.coalesce(F.col("__spread"), F.lit(0.0)) == 0.0, F.lit(0.0)
        ).otherwise((v - F.col("__center")) / F.col("__spread"))
    )
    return joined.withColumn(out_col, scaled).drop("__center", "__spread")
