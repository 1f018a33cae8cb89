"""Paragraph-level corpus deduplication (CCNet / FineWeb-style).

Web-scale training corpora carry two distinct paragraph pathologies that
document-level dedup cannot see: *boilerplate* (the same nav/footer/cookie
paragraph repeated across thousands of pages) and *partial duplication*
(documents that share most paragraphs but differ in a few). The public
recipe (Wenzek et al. 2020 CCNet §3.1; Penedo et al. 2024 FineWeb) is to
hash each paragraph, count occurrences across the corpus, and drop either
every copy of an over-represented paragraph or every copy but the
canonical first.

Scale shape (the whole point at 100 TB): a paragraph row is
``(doc, pos, 32-byte hash)`` — the corpus text itself never shuffles.
Frequencies are one hash-keyed aggregation with map-side combine;
survivors reassemble with ONE doc-keyed aggregation whose per-group state
is the document's own paragraph list (bounded by document size, never by
corpus size). No window over the corpus, no sort of the corpus.

No reference counterpart (`/root/reference` has no corpus surface);
semantics follow the published recipes above.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "split_paragraphs",
    "paragraph_frequency",
    "remove_repeated_paragraphs",
]


def _norm_col(para: Column, *, normalize: bool) -> Column:
    """The identity under which two paragraphs count as the same one:
    optionally casefolded with runs of whitespace collapsed (CCNet
    normalizes before hashing; boilerplate differs in stray spaces)."""
    if not normalize:
        return para
    return F.lower(F.regexp_replace(F.trim(para), r"\s+", " "))


def split_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    sep: str = "\n",
    min_chars: int = 1,
    normalize: bool = True,
) -> DataFrame:
    """One row per paragraph: ``(id_col, pos, para, h)``.

    ``pos`` is the paragraph's 0-based position in the document (the
    reassembly key), ``para`` the original text, ``h`` the md5 of the
    normalized form. Pure per-row explode — zero shuffle. Paragraphs
    shorter than ``min_chars`` after trimming are dropped (they are
    separators and blank lines, not content).
    """
    para = F.col("__p.para")
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(sep), -1)).alias(
            "pos", "__para"
        ),
    ).select(
        F.col(id_col),
        F.col("pos"),
        F.col("__para").alias("para"),
        F.md5(_norm_col(F.col("__para"), normalize=normalize)).alias("h"),
    ).where(F.length(F.trim(F.col("para"))) >= min_chars)


def paragraph_frequency(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    sep: str = "\n",
    min_chars: int = 1,
    normalize: bool = True,
    paras: DataFrame | None = None,
) -> DataFrame:
    """Corpus paragraph frequency table: ``(h, para, n_docs, n_occ)``.

    ``n_docs`` counts distinct documents containing the paragraph,
    ``n_occ`` total occurrences, ``para`` one representative original
    text (the min — deterministic). One shuffle keyed by the 32-byte
    hash; count-distinct rewrites to two map-side-combining aggregates.

    ``paras`` lets a caller that already holds this corpus's
    :func:`split_paragraphs` frame (same df/sep/min_chars/normalize)
    reuse it instead of re-splitting — a pipeline computing several
    paragraph surfaces pays the explode once.
    """
    if paras is None:
        paras = split_paragraphs(
            df, id_col, text_col,
            sep=sep, min_chars=min_chars, normalize=normalize,
        )
    return paras.groupBy("h").agg(
        F.min("para").alias("para"),
        F.count_distinct(F.col(id_col)).alias("n_docs"),
        F.count(F.lit(1)).alias("n_occ"),
    )


def remove_repeated_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    sep: str = "\n",
    min_chars: int = 1,
    normalize: bool = True,
    max_docs: int = 1,
    keep: str = "none",
    out_col: str | None = None,
    paras: DataFrame | None = None,
) -> DataFrame:
    """Rebuild each document with over-represented paragraphs removed.

    A paragraph is *repeated* when its normalized hash appears in more
    than ``max_docs`` distinct documents. Policy:

    - ``keep="none"`` (boilerplate removal): every copy of a repeated
      paragraph is dropped — CCNet §3.1 / FineWeb "remove lines
      duplicated across documents".
    - ``keep="first"`` (corpus paragraph dedup): the canonical first
      copy survives — the occurrence with the smallest
      ``(doc id, pos)`` — and all others are dropped.

    Output: the input ``df`` with ``out_col`` (default ``text_col``,
    i.e. replaced in place) holding the surviving paragraphs re-joined
    with ``sep``; ``n_paras`` and ``n_kept`` attest the removal. A
    document whose every paragraph was removed keeps an empty string.
    Documents with no qualifying paragraphs at all (e.g. empty text)
    pass through with ``n_paras = 0``.

    Plan: split (narrow) → hash-keyed frequency agg → broadcast-or-
    shuffle hash join back (Spark's planner picks; the frequency table is
    ``distinct paragraphs``-sized, usually far smaller than the corpus)
    → doc-keyed reassembly agg. The reassembly sorts only WITHIN a
    document (``array_sort`` of that document's `(pos, para)` structs),
    never across the corpus.
    """
    if keep not in ("none", "first"):
        raise ValueError(f"keep must be 'none' or 'first', got {keep!r}")
    out_col = out_col or text_col

    # ``paras`` passthrough: reuse a precomputed split_paragraphs frame
    # (same df/sep/min_chars/normalize contract as paragraph_frequency)
    if paras is None:
        paras = split_paragraphs(
            df, id_col, text_col,
            sep=sep, min_chars=min_chars, normalize=normalize,
        )
    stats = paras.groupBy("h").agg(
        F.count_distinct(F.col(id_col)).alias("n_docs"),
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first_occ"),
    )
    tagged = paras.join(stats, "h", "inner")
    survives = F.col("n_docs") <= F.lit(max_docs)
    if keep == "first":
        survives = survives | (
            (F.col("first_occ").getField(id_col) == F.col(id_col))
            & (F.col("first_occ.pos") == F.col("pos"))
        )
    rebuilt = (
        tagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(survives.cast("long")).alias("n_kept"),
            F.array_sort(
                F.collect_list(
                    F.when(
                        survives, F.struct(F.col("pos"), F.col("para"))
                    )
                )
            ).alias("__kept"),
        )
        .select(
            F.col(id_col),
            F.col("n_paras"),
            F.col("n_kept"),
            F.concat_ws(
                sep, F.transform(F.col("__kept"), lambda s: s.para)
            ).alias("__text"),
        )
    )
    keep_cols = [c for c in df.columns if c != out_col]
    return (
        df.select(*keep_cols)
        .join(rebuilt, id_col, "left")
        .select(
            *keep_cols,
            F.coalesce(F.col("__text"), F.lit("")).alias(out_col),
            F.coalesce(F.col("n_paras"), F.lit(0)).alias("n_paras"),
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        )
    )


def split_sentences(
    df: DataFrame,
    key_col: str,
    text_col: str,
    *,
    min_chars: int = 1,
) -> DataFrame:
    """Heuristic sentence segmentation: one row per sentence, in
    document order — the sentence-level sibling of the paragraph
    explode above, for sentence-granular dedup/decontamination prep.

    Splits after sentence-final punctuation (``. ! ?``, optionally
    followed by a closing quote/bracket) when the next character opens
    a sentence (uppercase, digit, or an opening quote/bracket) — a
    Java-regex lookaround split, fully JVM-side. KNOWN heuristic
    limits, documented not hidden: abbreviations ("Dr. Smith") and
    decimal-free initials split early; text without sentence-casing
    (code, lowercase chat) stays one sentence. Good enough for overlap
    matching; not a linguistic segmenter.

    Returns ``(key, sent_idx, sentence, n_chars)``; zero shuffle.
    """
    boundary = r"(?<=[.!?][\"'\)\]]?)\s+(?=[\"'\(\[]?[A-Z0-9])"
    trimmed = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    sents = F.when(
        trimmed == "", F.array().cast("array<string>")
    ).otherwise(F.split(trimmed, boundary))
    out = df.select(
        F.col(key_col),
        F.posexplode(sents).alias("sent_idx", "sentence"),
    ).withColumn("sentence", F.trim(F.col("sentence")))
    return out.where(F.length("sentence") >= int(min_chars)).withColumn(
        "n_chars", F.length("sentence")
    )
