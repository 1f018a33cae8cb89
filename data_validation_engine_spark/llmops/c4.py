"""C4 line-level cleaning (Raffel et al. 2020, "Exploring the Limits
of Transfer Learning with a Unified Text-to-Text Transformer",
arXiv:1910.10683 §2.2 — the other canonical public crawl-filter
recipe next to the Gopher rules in
:mod:`~data_validation_engine_spark.llmops.gopher`).

Where Gopher GATES whole documents, C4 REBUILDS them: lines that don't
look like prose are dropped and the page is re-joined from the
survivors, then page-level rules reject what's left. Everything is a
per-row projection over JVM builtins (split / filter / array_join /
contains) — zero shuffle, no Python hop; the counts are exact integers
so the whole surface rides an exact DuckDB oracle.

The rules (defaults = the paper's):

- keep only lines that END in a terminal punctuation mark
  (``. ! ? "``) — after right-trim;
- keep only lines with at least ``min_line_words`` (3) words;
- drop any line containing the word "javascript"
  (case-insensitive) — the cookie/JS-warning boilerplate rule;
- page flags on the ORIGINAL text: ``c4_has_lorem`` ("lorem ipsum",
  case-insensitive) and ``c4_has_brace`` (``{`` — code, not prose);
- ``c4_sentences``: terminal-punctuation count of the CLEANED text
  — occurrences of ``.!?`` plus one per kept line terminated by a
  bare end quotation mark (the fourth accepted terminator; without
  it dialogue-style prose would pass every line rule yet score zero
  sentences) — the paper's >= ``min_sentences`` (5) sentence floor;
- ``c4_keep`` = enough sentences AND no lorem-ipsum AND no brace.

Output columns: ``c4_text`` (kept lines re-joined with ``\\n`` — empty
string when nothing survives), ``c4_lines_kept``/``c4_lines_total``,
``c4_sentences``, the two flags, and ``c4_keep``. NULL text cleans to
the empty page and fails the sentence floor (keep false, never NULL).

No reference counterpart (``/root/reference`` has no corpus surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["c4_clean", "C4_TERMINAL_PUNCT"]

#: Terminal punctuation marks a prose line must end with (§2.2).
C4_TERMINAL_PUNCT = (".", "!", "?", '"')


def _n_words(line: Column) -> Column:
    return F.size(
        F.filter(F.split(line, r"\s+"), lambda w: F.length(w) > 0)
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_line_words: int = 3,
    min_sentences: int = 5,
    clean_col: str = "c4_text",
    keep_col: str = "c4_keep",
) -> DataFrame:
    """Attach the C4-cleaned page plus the paper's page-level gate —
    see the module docstring for the exact rules."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(text, r"\n")
    ends_ok = lambda ln: F.rtrim(ln).substr(-1, 1).isin(  # noqa: E731
        *C4_TERMINAL_PUNCT
    )
    kept = F.filter(
        lines,
        lambda ln: ends_ok(ln)
        & (_n_words(ln) >= F.lit(int(min_line_words)))
        & ~F.lower(ln).contains("javascript"),
    )
    cleaned = F.array_join(F.transform(kept, F.trim), "\n")
    # terminal-punct count via the length difference — no char-array
    # materialisation per row. The keep rule accepts an end quotation
    # mark as a line terminator (C4_TERMINAL_PUNCT), so a kept line
    # ending in a BARE quote (no .!? before it) must count as one
    # sentence too — otherwise dialogue-style prose passes every line
    # rule yet scores zero sentences and fails the page floor
    quote_sents = F.size(
        F.filter(
            kept,
            lambda ln: (F.rtrim(ln).substr(-1, 1) == F.lit('"'))
            & ~F.rtrim(ln).substr(-2, 1).isin(".", "!", "?"),
        )
    )
    n_sentences = (
        F.length(cleaned)
        - F.length(F.translate(cleaned, ".!?", ""))
        + quote_sents
    )
    has_lorem = F.lower(text).contains("lorem ipsum")
    has_brace = text.contains("{")
    out = df.withColumns(
        {
            clean_col: cleaned,
            "c4_lines_total": F.size(
                F.filter(lines, lambda ln: F.length(F.trim(ln)) > 0)
            ).cast("long"),
            "c4_lines_kept": F.size(kept).cast("long"),
            "c4_sentences": n_sentences.cast("long"),
            "c4_has_lorem": has_lorem,
            "c4_has_brace": has_brace,
        }
    )
    return out.withColumn(
        keep_col,
        (F.col("c4_sentences") >= F.lit(int(min_sentences)))
        & ~F.col("c4_has_lorem")
        & ~F.col("c4_has_brace"),
    )
