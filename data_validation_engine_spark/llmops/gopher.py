"""Gopher-rule document quality gate (Rae et al. 2021, "Scaling
Language Models: Methods, Analysis & Insights from Training Gopher",
arXiv:2112.11446 §A1.1 — the public quality-filter recipe most crawl
pipelines start from; also the FineWeb/Dolma baseline filter set).

Every metric is a per-row projection over JVM builtins (split /
filter / size / aggregate) — zero shuffle, no Python hop — so the
gate runs at scan speed on 100 TB and composes with the sync-filter
stage like the other quality gates (``quality_filters``,
``repetition_stats``). Metrics are exact integers plus single
correctly-rounded double ratios (the engine-exact class every oracle
replays bit-identically).

The rules (defaults = the paper's published thresholds):

- ``word_count`` in [min_words, max_words] (50..100k);
- ``mean_word_len`` in [min_mean_word_len, max_mean_word_len] (3..10);
- ``symbol_word_ratio`` (``#`` or ``...``/``…`` occurrences per word)
  <= max_symbol_word_ratio (0.1);
- fraction of lines starting with a bullet < max_bullet_line_frac
  (0.9) and ending with an ellipsis < max_ellipsis_line_frac (0.3);
- fraction of words containing >= 1 alphabetic character >=
  min_alpha_word_frac (0.8);
- >= min_stop_words (2) DISTINCT hits from the paper's stop-word list
  (the "contains common English words" rule).

``gopher_keep`` is the conjunction. Flags are emitted per rule so a
curation pipeline can re-weigh rather than hard-drop.

No reference counterpart (``/root/reference`` has no corpus surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "gopher_quality_flags",
    "gopher_repetition_flags",
    "GOPHER_STOP_WORDS",
]

#: The paper's common-English-words presence list (§A1.1).
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: Bullet characters the line rule recognises (paper: bullet point;
#: common crawl practice adds the ASCII variants).
_BULLETS = ("•", "-", "*")


def _count_occurrences(col: Column, token: str) -> Column:
    """Non-overlapping occurrence count of a literal token — exact via
    the length difference (no regex escaping pitfalls)."""
    return F.when(
        F.length(col) > 0,
        (
            F.length(col)
            - F.length(F.replace(col, F.lit(token), F.lit("")))
        )
        / F.lit(len(token)),
    ).otherwise(F.lit(0)).cast("long")


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_words: int = 2,
    keep_col: str = "gopher_keep",
) -> DataFrame:
    """Attach the Gopher rule metrics + per-rule booleans + the
    conjunction ``keep_col``. NULL text fails every rule (keep false),
    it never propagates NULL flags into a downstream filter."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    # words/lines materialize as real columns first — ~10 downstream
    # references each would otherwise re-run the regex split per
    # output column (the same fix gopher_repetition_flags documents)
    prep_cols = {
        "__gq_words": F.filter(
            F.split(text, r"\s+"), lambda w: F.length(w) > 0
        ),
        "__gq_lines": F.filter(
            F.split(text, r"\n"), lambda ln: F.length(F.trim(ln)) > 0
        ),
    }
    words = F.col("__gq_words")
    n_words = F.size(words)
    total_word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = F.when(
        n_words > 0, total_word_chars.cast("double") / n_words
    )
    n_symbols = _count_occurrences(text, "#") + _count_occurrences(
        text, "..."
    ) + _count_occurrences(text, "…")
    symbol_ratio = F.when(
        n_words > 0, n_symbols.cast("double") / n_words
    )
    lines = F.col("__gq_lines")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.substring(F.ltrim(ln), 1, 1).isin(*_BULLETS),
        )
    )
    n_ellipsis = F.size(
        F.filter(
            lines,
            lambda ln: F.rtrim(ln).endswith("...")
            | F.rtrim(ln).endswith("…"),
        )
    )
    bullet_frac = F.when(n_lines > 0, n_bullet.cast("double") / n_lines)
    ellipsis_frac = F.when(
        n_lines > 0, n_ellipsis.cast("double") / n_lines
    )
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    )
    alpha_frac = F.when(
        n_words > 0, n_alpha_words.cast("double") / n_words
    )
    lower_words = F.transform(words, F.lower)
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOP_WORDS]),
            lambda s: F.array_contains(lower_words, s),
        )
    )
    flags = {
        "flag_word_count": (n_words >= min_words)
        & (n_words <= max_words),
        "flag_mean_word_len": F.coalesce(
            (mean_word_len >= F.lit(float(min_mean_word_len)))
            & (mean_word_len <= F.lit(float(max_mean_word_len))),
            F.lit(False),
        ),
        "flag_symbol_ratio": F.coalesce(
            symbol_ratio <= F.lit(float(max_symbol_word_ratio)),
            F.lit(False),
        ),
        # a document with no non-empty lines has no bullet/ellipsis
        # lines to object to — the line rules pass vacuously (the word
        # rule is what rejects empty text)
        "flag_bullet_lines": F.coalesce(
            bullet_frac < F.lit(float(max_bullet_line_frac)),
            n_lines == 0,
        ),
        "flag_ellipsis_lines": F.coalesce(
            ellipsis_frac < F.lit(float(max_ellipsis_line_frac)),
            n_lines == 0,
        ),
        "flag_alpha_words": F.coalesce(
            alpha_frac >= F.lit(float(min_alpha_word_frac)),
            F.lit(False),
        ),
        "flag_stop_words": n_stop >= F.lit(int(min_stop_words)),
    }
    out = df.withColumns(prep_cols).withColumns(
        {
            "gopher_words": n_words.cast("long"),
            "gopher_mean_word_len": mean_word_len,
            "gopher_symbol_ratio": symbol_ratio,
            "gopher_bullet_frac": bullet_frac,
            "gopher_ellipsis_frac": ellipsis_frac,
            "gopher_alpha_frac": alpha_frac,
            "gopher_stop_words": n_stop.cast("long"),
            **flags,
        }
    ).drop(*prep_cols)
    keep = None
    for c in flags:
        keep = F.col(c) if keep is None else keep & F.col(c)
    return out.withColumn(keep_col, keep)


def _dup_beyond_first(items: Column) -> Column:
    """``struct(cnt, chars)`` — occurrences BEYOND the first of any
    repeated item (the datatrove/NeMo "duplicate" convention): ONE
    prev-carrying fold over the sorted copy. The sorted array is the
    fold's ARGUMENT, never captured inside the lambda — a captured
    array re-evaluates per element and turns O(N) into O(N² log N)."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("cnt"),
        F.lit(0).cast("long").alias("chars"),
    )
    return F.aggregate(
        F.sort_array(items),
        init,
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["cnt"] + 1)
            .otherwise(acc["cnt"])
            .alias("cnt"),
            F.when(x == acc["prev"], acc["chars"] + F.length(x))
            .otherwise(acc["chars"])
            .alias("chars"),
        ),
        lambda acc: F.struct(
            acc["cnt"].alias("cnt"), acc["chars"].alias("chars")
        ),
    )


def _top_gram(grams: Column) -> Column:
    """``struct(cnt, len)`` of the most frequent gram (ties → the
    lexicographically SMALLEST gram, which the sorted-order fold gives
    for free: a later equal count never displaces the earlier best
    under strict ``>``)."""
    srt = F.sort_array(grams)
    n = F.size(grams)
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("cur"),
        F.lit(0).cast("long").alias("best_c"),
        F.lit("").alias("best_v"),
    )
    fold = F.aggregate(
        srt,
        init,
        lambda acc, g: F.when(
            g == acc["prev"],
            F.struct(
                g.alias("prev"),
                (acc["cur"] + 1).alias("cur"),
                F.when(acc["cur"] + 1 > acc["best_c"], acc["cur"] + 1)
                .otherwise(acc["best_c"])
                .alias("best_c"),
                F.when(acc["cur"] + 1 > acc["best_c"], g)
                .otherwise(acc["best_v"])
                .alias("best_v"),
            ),
        ).otherwise(
            F.struct(
                g.alias("prev"),
                F.lit(1).cast("long").alias("cur"),
                F.when(F.lit(1) > acc["best_c"], F.lit(1).cast("long"))
                .otherwise(acc["best_c"])
                .alias("best_c"),
                F.when(F.lit(1) > acc["best_c"], g)
                .otherwise(acc["best_v"])
                .alias("best_v"),
            )
        ),
        lambda acc: F.struct(
            acc["best_c"].alias("cnt"),
            F.length(acc["best_v"]).cast("long").alias("len"),
        ),
    )
    return F.when(
        n >= 1, fold
    ).otherwise(
        F.struct(
            F.lit(0).cast("long").alias("cnt"),
            F.lit(0).cast("long").alias("len"),
        )
    )


def gopher_repetition_flags(
    df: DataFrame,
    text_col: str = "text",
    *,
    max_dup_line_frac: float = 0.30,
    max_dup_para_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_dup_para_char_frac: float = 0.20,
    max_top_gram_fracs: tuple[float, ...] = (0.20, 0.18, 0.16),
    max_dup_gram_fracs: tuple[float, ...] = (
        0.15, 0.14, 0.13, 0.12, 0.11, 0.10,
    ),
    keep_col: str = "rep_keep",
) -> DataFrame:
    """The Gopher §A1.2 repetition-removal signal bundle (Rae 2021
    Table A1 — the other half of the filter whose §A1.1 quality rules
    are :func:`gopher_quality_flags`; same defaults as the paper and
    its public reimplementations):

    - ``rep_dup_line_frac`` / ``rep_dup_para_frac`` — occurrences
      beyond the first of any repeated (trimmed, non-empty) line /
      paragraph, over the line / paragraph count (thresholds 0.30);
    - ``rep_dup_line_char_frac`` / ``rep_dup_para_char_frac`` — the
      same occurrences weighted by their character length, over total
      line / paragraph characters (0.20);
    - ``rep_top_{2,3,4}gram_frac`` — character mass of the most
      frequent word n-gram (count × gram length, ties → smallest
      gram; a top gram occurring once is not repetition — frac 0.0)
      over the joined-token character total (0.20/0.18/0.16);
    - ``rep_dup_{5..10}gram_frac`` — characters covered by ANY
      occurrence of a word n-gram appearing ≥ 2 times, over the same
      total (0.15..0.10). Overlapping occurrences are counted once:
      token intervals merge when they overlap (adjacent intervals stay
      separate, so the boundary separator is never counted), and a
      merged token run [a, b] contributes its word characters plus the
      b−a interior separators — the joined-token coordinate system,
      pinned so every engine replays it exactly.

    Words, lines and the fail-closed NULL-text convention match
    :func:`gopher_quality_flags` (empty text: metrics NULL, every flag
    false); a document with words but fewer than n grams has frac 0.0
    for that n (no repetition evidence — the flag passes). All metrics
    are single correctly-rounded divisions of exact integers
    (``rep_words``/``rep_total_chars``/``rep_dup_lines``/
    ``rep_dup_paras`` ride along as the integer anchors).

    Scale shape: every signal is a per-row ordered fold over sorted
    copies of the document's own lines / paragraphs / gram arrays —
    O(W log W) per row, zero shuffle, plan-asserted Exchange-free like
    the quality gate; runs at scan speed and composes with the
    sync-filter stage. Relation to :func:`..text.repetition_stats`:
    that operator computes the distinct-count n-gram fractions and the
    distributed token mode; THIS one is the paper's char-mass family.
    """
    if len(max_top_gram_fracs) != 3:
        raise ValueError(
            "gopher_repetition_flags: max_top_gram_fracs needs exactly "
            f"3 thresholds (n=2,3,4), got {len(max_top_gram_fracs)}"
        )
    if len(max_dup_gram_fracs) != 6:
        raise ValueError(
            "gopher_repetition_flags: max_dup_gram_fracs needs exactly "
            f"6 thresholds (n=5..10), got {len(max_dup_gram_fracs)}"
        )
    text = F.coalesce(F.col(text_col), F.lit(""))
    # words/lines/paras materialize as REAL columns first: the dozens
    # of downstream references then read the row's array instead of
    # re-running the regex split each time (CollapseProject keeps a
    # non-cheap alias referenced more than once un-inlined) — measured
    # ~5x on the 13-signal projection
    prep_cols = {
        "__rep_words": F.filter(
            F.split(text, r"\s+"), lambda w: F.length(w) > 0
        ),
        "__rep_lines": F.transform(
            F.filter(
                F.split(text, r"\n"),
                lambda ln: F.length(F.trim(ln)) > 0,
            ),
            F.trim,
        ),
        "__rep_paras": F.transform(
            F.filter(
                F.split(text, r"\n{2,}"),
                lambda p: F.length(F.trim(p)) > 0,
            ),
            F.trim,
        ),
        "__rep_has_text": F.length(text) > 0,
    }
    words = F.col("__rep_words")
    lines = F.col("__rep_lines")
    paras = F.col("__rep_paras")
    n_words = F.size(words)
    word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    total_chars = F.when(
        n_words > 0, word_chars + n_words.cast("long") - 1
    ).otherwise(F.lit(0).cast("long"))

    def _grams(n: int) -> Column:
        # n-grams via n shifted-slice zip_with joins — argument-level
        # only (a slice(words, i, n) inside a per-element lambda would
        # re-split the text once per gram)
        g_len = n_words - n + 1

        def _build() -> Column:
            acc = F.slice(words, 1, g_len)
            for j in range(1, n):
                acc = F.zip_with(
                    acc,
                    F.slice(words, 1 + j, g_len),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            return acc

        return F.when(n_words >= n, _build()).otherwise(
            F.array().cast("array<string>")
        )

    def _dup_cover_frac(n: int) -> Column:
        """Fraction of joined-token chars covered by grams occurring
        >= 2 times — gram-start intervals merged on overlap, chars
        summed per merged token run. Every sorted/derived array is an
        ARGUMENT of the next higher-order function, never captured
        inside a per-element lambda (a captured array re-evaluates per
        element: the O(G² log G) trap); neighbor equality uses
        shifted-slice zip_with, so the whole signal is O(G log G)."""
        # the sorted (gram, start) struct array materializes as its own
        # column (built in the second prep stage below): three
        # references read the row's array instead of re-sorting
        gs = F.col(f"__rep_gs{n}")
        g_cnt = F.size(gs)
        null_gs = F.array(
            F.struct(
                F.lit(None).cast("string").alias("g"),
                F.lit(0).alias("i"),
            )
        )
        prev_shift = F.concat(
            null_gs, F.slice(gs, 1, F.greatest(g_cnt - 1, F.lit(0)))
        )
        next_shift = F.concat(
            F.slice(gs, 2, F.greatest(g_cnt - 1, F.lit(0))), null_gs
        )
        # a sorted element is part of a duplicate run iff it matches a
        # neighbor; emit its ORIGINAL start index
        flagged = F.zip_with(
            gs,
            F.zip_with(
                prev_shift,
                next_shift,
                lambda p, nx: F.struct(
                    p["g"].alias("pg"), nx["g"].alias("ng")
                ),
            ),
            lambda s, pn: F.struct(
                s["i"].alias("i"),
                (
                    F.coalesce(s["g"] == pn["pg"], F.lit(False))
                    | F.coalesce(s["g"] == pn["ng"], F.lit(False))
                ).alias("f"),
            ),
        )
        dup_starts = F.sort_array(
            F.transform(
                F.filter(flagged, lambda x: x["f"]), lambda x: x["i"]
            )
        )
        # merge token intervals [i, i+n-1] on OVERLAP (next start <=
        # last end; adjacent runs stay separate so the boundary
        # separator is never charged), building the small merged-run
        # array, then charge each run its word chars + interior
        # separators — runs are disjoint, so the slice-sums total O(W)
        empty_runs = F.array().cast("array<struct<a:int,b:int>>")
        init = F.struct(
            empty_runs.alias("runs"), F.lit(0).alias("a"), F.lit(0).alias("b")
        )
        runs = F.aggregate(
            dup_starts,
            init,
            lambda acc, s: F.when(
                acc["b"] == 0,
                F.struct(
                    acc["runs"].alias("runs"),
                    s.alias("a"),
                    (s + F.lit(n - 1)).alias("b"),
                ),
            )
            .when(
                s <= acc["b"],
                F.struct(
                    acc["runs"].alias("runs"),
                    acc["a"].alias("a"),
                    F.greatest(acc["b"], s + F.lit(n - 1)).alias("b"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(
                        acc["runs"],
                        F.array(
                            F.struct(
                                acc["a"].alias("a"), acc["b"].alias("b")
                            )
                        ),
                    ).alias("runs"),
                    s.alias("a"),
                    (s + F.lit(n - 1)).alias("b"),
                )
            ),
            lambda acc: F.when(
                acc["b"] > 0,
                F.concat(
                    acc["runs"],
                    F.array(
                        F.struct(acc["a"].alias("a"), acc["b"].alias("b"))
                    ),
                ),
            ).otherwise(acc["runs"]),
        )
        covered = F.aggregate(
            runs,
            F.lit(0).cast("long"),
            lambda acc, r: acc
            + F.aggregate(
                F.slice(words, r["a"], r["b"] - r["a"] + F.lit(1)),
                F.lit(0).cast("long"),
                lambda a2, w: a2 + F.length(w),
            )
            + (r["b"] - r["a"]).cast("long"),
        )
        return F.when(
            (n_words >= n) & (total_chars > 0),
            F.round(
                covered.cast("double") / total_chars.cast("double"), 6
            ),
        ).otherwise(
            F.when(n_words > 0, F.lit(0.0)).otherwise(
                F.lit(None).cast("double")
            )
        )

    line_stats = _dup_beyond_first(lines)
    para_stats = _dup_beyond_first(paras)
    n_lines = F.size(lines)
    n_paras = F.size(paras)
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    para_chars = F.aggregate(
        paras, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )

    def _frac(num: Column, den: Column) -> Column:
        return F.when(
            den > 0, F.round(num.cast("double") / den.cast("double"), 6)
        )

    metrics: dict[str, Column] = {
        "rep_words": F.when(
            F.col("__rep_has_text"), n_words.cast("long")
        ).otherwise(F.lit(0).cast("long")),
        "rep_total_chars": total_chars,
        "rep_dup_lines": line_stats["cnt"],
        "rep_dup_paras": para_stats["cnt"],
        "rep_dup_line_frac": _frac(line_stats["cnt"], n_lines),
        "rep_dup_line_char_frac": _frac(line_stats["chars"], line_chars),
        "rep_dup_para_frac": _frac(para_stats["cnt"], n_paras),
        "rep_dup_para_char_frac": _frac(para_stats["chars"], para_chars),
    }
    top_metrics: dict[str, float] = {}
    for n, thr in zip((2, 3, 4), max_top_gram_fracs):
        tg = _top_gram(_grams(n))
        # a top gram occurring once is not repetition — frac 0.0 (the
        # datatrove/NeMo convention: count <= 1 never filters)
        metrics[f"rep_top_{n}gram_frac"] = F.when(
            (n_words >= n) & (total_chars > 0),
            F.when(
                tg["cnt"] >= 2,
                F.round(
                    (tg["cnt"] * tg["len"]).cast("double")
                    / total_chars.cast("double"),
                    6,
                ),
            ).otherwise(F.lit(0.0)),
        ).otherwise(
            F.when(n_words > 0, F.lit(0.0)).otherwise(
                F.lit(None).cast("double")
            )
        )
        top_metrics[f"rep_top_{n}gram_frac"] = float(thr)
    dup_metrics: dict[str, float] = {}
    for n, thr in zip((5, 6, 7, 8, 9, 10), max_dup_gram_fracs):
        metrics[f"rep_dup_{n}gram_frac"] = _dup_cover_frac(n)
        dup_metrics[f"rep_dup_{n}gram_frac"] = float(thr)

    flags: dict[str, Column] = {
        "flag_dup_lines": F.coalesce(
            F.col("rep_dup_line_frac") <= F.lit(float(max_dup_line_frac)),
            F.lit(False),
        ),
        "flag_dup_line_chars": F.coalesce(
            F.col("rep_dup_line_char_frac")
            <= F.lit(float(max_dup_line_char_frac)),
            F.lit(False),
        ),
        "flag_dup_paras": F.coalesce(
            F.col("rep_dup_para_frac") <= F.lit(float(max_dup_para_frac)),
            F.lit(False),
        ),
        "flag_dup_para_chars": F.coalesce(
            F.col("rep_dup_para_char_frac")
            <= F.lit(float(max_dup_para_char_frac)),
            F.lit(False),
        ),
        **{
            f"flag_top_{n}gram": F.coalesce(
                F.col(c) <= F.lit(t), F.lit(False)
            )
            for (c, t), n in zip(top_metrics.items(), (2, 3, 4))
        },
        **{
            f"flag_dup_{n}gram": F.coalesce(
                F.col(c) <= F.lit(t), F.lit(False)
            )
            for (c, t), n in zip(
                dup_metrics.items(), (5, 6, 7, 8, 9, 10)
            )
        },
    }
    gs_cols = {
        f"__rep_gs{n}": F.sort_array(
            F.transform(
                _grams(n),
                lambda x, i: F.struct(x.alias("g"), (i + 1).alias("i")),
            )
        )
        for n in (5, 6, 7, 8, 9, 10)
    }
    out = (
        df.withColumns(prep_cols)
        .withColumns(gs_cols)
        .withColumns(metrics)
        .withColumns(flags)
        .drop(*prep_cols, *gs_cols)
    )
    keep = None
    for c in flags:
        keep = F.col(c) if keep is None else keep & F.col(c)
    return out.withColumn(keep_col, keep)
