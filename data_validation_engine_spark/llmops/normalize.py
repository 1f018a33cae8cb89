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

__all__ = [
    "normalize_text",
    "mojibake_stats",
    "fix_mojibake",
    "MOJIBAKE_MARKERS",
]


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


# ---------------------------------------------------------------------------
# Mojibake (encoding-artifact) detection and repair — the ftfy-class
# cleanup every crawl pipeline runs before quality scoring. The classic
# artifact is UTF-8 bytes mis-decoded as Latin-1 / Windows-1252 ("â€™"
# where "’" belongs, "Ã©" for "é"): the REPAIR is the inverse
# round-trip, re-encode as Latin-1 and decode the bytes as UTF-8 —
# expressible entirely in JVM builtins (encode/decode), no Python hop.
# Detection counts a pinned marker table (engine-exact integers, so it
# rides a DuckDB oracle); the repair decision is deliberately
# conservative and per-row: only applied when the text is losslessly
# Latin-1-representable, the re-decode produced no U+FFFD replacement
# character, and the marker count strictly decreased.
# ---------------------------------------------------------------------------

#: UTF-8-as-Latin-1/Windows-1252 artifact markers (the high-frequency
#: subset of the public ftfy heuristics; all printable, so the table is
#: portable to any engine as plain string literals).
MOJIBAKE_MARKERS = (
    "â€™", "â€œ", "â€˜", "â€“", "â€”", "â€¦", "â€¢",
    "Ã©", "Ã¨", "Ãª", "Ã¼", "Ã¶", "Ã¤", "Ã±", "Ã§", "Ã³", "Ã¡",
    "Ã­", "Ãº", "Ã ", "Â£", "Â°", "Â·", "Â»", "Â«",
    # second-layer signatures (mojibake of mojibake): broken â / € / ™
    # — these are what lets the strict-decrease guard peel double
    # mojibake one layer per call
    "Ã¢", "Ãƒ", "Ã‚", "â‚¬", "â„¢",
)

#: The 27 codepoints where Windows-1252 differs from Latin-1 (cp1252
#: maps bytes 0x80–0x9F to printable characters; Latin-1 maps them to
#: C1 controls). Spark's encode() supports only ISO-8859-1 from the
#: legacy family, so the cp1252 re-encode is TRANSLATE (these chars →
#: their byte-equivalent C1 controls) followed by the Latin-1 encode —
#: a 1:1 char map, exactly what F.translate does.
_CP1252_TO_BYTE = {
    "€": 0x80, "‚": 0x82, "ƒ": 0x83, "„": 0x84,
    "…": 0x85, "†": 0x86, "‡": 0x87, "ˆ": 0x88,
    "‰": 0x89, "Š": 0x8A, "‹": 0x8B, "Œ": 0x8C,
    "Ž": 0x8E, "‘": 0x91, "’": 0x92, "“": 0x93,
    "”": 0x94, "•": 0x95, "–": 0x96, "—": 0x97,
    "˜": 0x98, "™": 0x99, "š": 0x9A, "›": 0x9B,
    "œ": 0x9C, "ž": 0x9E, "Ÿ": 0x9F,
}
_CP1252_CHARS = "".join(_CP1252_TO_BYTE)
_CP1252_CTRLS = "".join(chr(b) for b in _CP1252_TO_BYTE.values())


def _marker_count(col: Column, markers: tuple[str, ...]) -> Column:
    """Total non-overlapping occurrences of every marker — exact via
    the length-difference trick (no regex escaping pitfalls)."""
    total = F.lit(0).cast("long")
    for m in markers:
        total = total + (
            (F.length(col) - F.length(F.replace(col, F.lit(m), F.lit(""))))
            / F.lit(len(m))
        ).cast("long")
    return total


def mojibake_stats(
    df: DataFrame,
    text_col: str = "text",
    *,
    markers: tuple[str, ...] = MOJIBAKE_MARKERS,
    round_to: int = 6,
) -> DataFrame:
    """Attach ``mojibake_count`` (exact long — total marker
    occurrences) and ``mojibake_frac`` (count / char length, one
    correctly-rounded division; NULL for empty/NULL text). Per-row
    projection, zero shuffle — runs at scan speed and composes with
    the sync-filter stage like the other quality signals."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    cnt = _marker_count(text, tuple(markers))
    return df.withColumns(
        {
            "mojibake_count": cnt,
            "mojibake_frac": F.when(
                F.length(text) > 0,
                F.round(
                    cnt.cast("double") / F.length(text).cast("double"),
                    round_to,
                ),
            ),
        }
    )


def fix_mojibake(
    df: DataFrame,
    text_col: str = "text",
    *,
    output_col: str | None = None,
    markers: tuple[str, ...] = MOJIBAKE_MARKERS,
    flag_col: str = "mojibake_fixed",
) -> DataFrame:
    """Repair UTF-8-as-Windows-1252/Latin-1 mojibake with the inverse
    round-trip — re-encode as cp1252 (TRANSLATE the 27 cp1252-only
    printables to their C1-control byte equivalents, then the Latin-1
    encode Spark supports) and decode the bytes as UTF-8 — under three
    per-row guards, ALL of which must hold or the text passes through
    untouched (``flag_col`` records the decision):

    1. every codepoint is cp1252-representable (U+0000..U+00FF or one
       of the 27 cp1252 printables — emoji/CJK text is never touched,
       Spark's encode would smash it to ``?``);
    2. the re-encoded bytes are valid UTF-8 (``is_valid_utf8`` on the
       binary — ANSI ``decode`` THROWS on malformed input, so the
       decode only ever evaluates under this guard);
    3. the marker count strictly decreased (the round-trip actually
       removed artifacts instead of mangling legitimate Latin-1 text
       — "Ã—Ã˜" sequences that survive a clean decode stay put).

    Doubly-encoded text is repaired one layer per call (run twice for
    the rare double-mojibake). All JVM builtins, zero shuffle. The
    repair itself is engine-specific byte work, so it is
    pytest-pinned against Python's codec round-trip rather than
    SQL-oracled; the DECISION inputs (marker counts) are engine-exact.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    mk = tuple(markers)
    cp_bytes = F.encode(
        F.translate(text, _CP1252_CHARS, _CP1252_CTRLS), "ISO-8859-1"
    )
    cp1252_ok = ~text.rlike(f"[^\\x00-\\xff{_CP1252_CHARS}]")
    valid_utf8 = F.is_valid_utf8(cp_bytes)
    # decode NEVER evaluates on malformed bytes (ANSI decode throws):
    # null when invalid, and the guards below are null-safe
    redecoded = F.when(
        cp1252_ok & valid_utf8, F.decode(cp_bytes, "UTF-8")
    )
    improves = _marker_count(redecoded, mk) < _marker_count(text, mk)
    apply_fix = cp1252_ok & valid_utf8 & F.coalesce(improves, F.lit(False))
    out = output_col or text_col
    return df.withColumns(
        {
            out: F.when(apply_fix, redecoded).otherwise(
                F.col(text_col)
            ),
            flag_col: F.coalesce(apply_fix, F.lit(False)),
        }
    )
