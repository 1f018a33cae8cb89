"""Corpus text normalization: Unicode form + control-char + whitespace
canonicalization — the first step of every public web-corpus recipe
(CCNet, Gopher, RefinedWeb all NFKC-fold before dedup/quality).

Scale shape: one per-row projection, zero shuffle. Everything except
the Unicode form runs JVM-side (regexp/lower — whole-stage codegen).
Unicode normalization (NFC/NFKC/...) has no Spark SQL builtin, so it is
the one honest Pandas-UDF hop in the path — Arrow-batched,
``pandas.Series.str.normalize`` (C-implemented), applied ONLY when
``form`` is requested; ``form=None`` keeps the operator pure-JVM.

The reference has no text surface; net-new extension operator like the
rest of ``llmops``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")

__all__ = ["normalize_text"]


def _unicode_normalize(col: Column, form: str) -> Column:
    import pandas as pd  # noqa: F401 — resolves the UDF type hints
    from pyspark.sql.functions import pandas_udf

    def _norm(s):
        return s.str.normalize(form)

    _norm.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf("string")(_norm)(col)


def normalize_text(
    df: DataFrame,
    text_col: str,
    *,
    form: str | None = "NFKC",
    lowercase: bool = False,
    strip_control: bool = True,
    collapse_whitespace: bool = False,
    output_col: str | None = None,
) -> DataFrame:
    """Canonicalize a text column; NULL stays NULL.

    Order (the standard recipe order — form folding first so later
    steps see folded characters):

    1. ``form`` — Unicode normalization (``NFC``/``NFKC``/``NFD``/
       ``NFKD``; ``None`` skips and keeps the operator JVM-only).
       NFKC is what tokenizer prep wants: full-width → ASCII,
       ligatures ﬁ → fi, compatibility digits ① → 1.
    2. ``strip_control`` — drop control/format chars (``\\p{Cc}``,
       ``\\p{Cf}`` — zero-width joiners, BOMs, stray C0 bytes) EXCEPT
       tab and newline, after folding CRLF/CR to ``\\n``.
    3. ``lowercase`` — ``lower()`` (locale-independent JVM lowering).
    4. ``collapse_whitespace`` — runs of space/tab → one space, 3+
       newlines → 2 (paragraph break preserved), then trim.

    Writes ``output_col`` (default: in place).
    """
    if form is not None and form not in _FORMS:
        raise ValueError(
            f"form must be one of {_FORMS} or None, got {form!r}"
        )
    col: Column = F.col(text_col)
    if form is not None:
        col = _unicode_normalize(col, form)
    if strip_control:
        col = F.regexp_replace(col, "\r\n|\r", "\n")
        # Java char-class intersection: all Cc/Cf except tab+newline
        col = F.regexp_replace(col, "[[\\p{Cc}\\p{Cf}]&&[^\n\t]]", "")
    if lowercase:
        col = F.lower(col)
    if collapse_whitespace:
        # strip spaces adjacent to newlines BEFORE collapsing newline
        # runs: a blank line containing a space would otherwise break
        # the run and defeat the documented "3+ newlines → 2"
        col = F.regexp_replace(col, "[ \t]+", " ")
        col = F.regexp_replace(col, " ?\n ?", "\n")
        col = F.regexp_replace(col, "\n{3,}", "\n\n")
        # full whitespace trim — Spark's trim() strips spaces only, so
        # boundary newlines (e.g. from upstream tag stripping) survive it
        col = F.regexp_replace(col, "^\\s+|\\s+$", "")
    return df.withColumn(output_col or text_col, col)
