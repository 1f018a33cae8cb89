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

__all__ = ["gopher_quality_flags", "GOPHER_STOP_WORDS"]

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
    words = F.filter(
        F.split(text, r"\s+"), lambda w: F.length(w) > 0
    )
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
    lines = F.filter(
        F.split(text, r"\n"), lambda ln: F.length(F.trim(ln)) > 0
    )
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
    out = df.withColumns(
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
    )
    keep = None
    for c in flags:
        keep = F.col(c) if keep is None else keep & F.col(c)
    return out.withColumn(keep_col, keep)
