"""Cross-document repeated-span detection via winnowing fingerprints.

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") deduplicate at the *substring* level with a suffix array —
exact, but a distributed suffix array over 100 TB is its own project.
The public scalable alternative is winnowing (Schleimer, Wilkerson,
Aiken 2003, the MOSS algorithm): hash every ``width``-char gram, then in
every window of ``window`` consecutive gram hashes select the minimum.
Selection is CONTENT-anchored — a naive "every k-th gram" scheme anchors
windows to the document start and silently misses copies that sit at a
different offset (two copies only collide when their offsets agree mod
the stride). Winnowing's guarantee: any copied span of length >=
``width + window - 1`` chars contains a full gram window in both
documents with identical hashes, whose minimum is selected in both — so
every such span produces at least one shared fingerprint, wherever the
copies sit.

Scale shape: fingerprinting is a per-row expression (gram hashes +
sliding minima, O(n·window) work per doc, ~2n/window selected rows
expected out); the text never shuffles. Pair candidates come from the
skew-bounded self-join on the 8-byte fingerprint (a ubiquitous
boilerplate span decomposes into bounded blocks instead of going
quadratic); the final count is one (id_a, id_b)-keyed aggregation.

No reference counterpart (`/root/reference` has no corpus surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_validation_engine_spark.llmops.pairs import (
    DEFAULT_MAX_BUCKET_ROWS,
    bounded_self_join,
)

__all__ = [
    "winnowed_fingerprints",
    "shared_span_pairs",
    "shared_spans_incremental",
]


def _norm(text: Column, *, normalize: bool) -> Column:
    if not normalize:
        return text
    return F.lower(F.regexp_replace(text, r"\s+", " "))


def _gram_hashes(t: Column, width: int) -> Column:
    """60-bit integer hash of every ``width``-char gram: the first 15
    hex chars of the md5 (the repo's engine-portable hash idiom,
    llmops/split.py) — an 8-byte join key instead of a 32-byte digest.
    Guarded for sub-width texts: ``sequence(1, n)`` with n < 1 would
    DESCEND (Spark auto-steps -1 when start > stop) and hash garbage
    windows at non-positive positions."""
    return F.when(
        F.length(t) >= width,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - width + 1),
            lambda i: F.conv(
                F.substring(F.md5(F.substring(t, i, width)), 1, 15), 16, 10
            ).cast("long"),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def winnowed_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    width: int = 24,
    window: int = 8,
    normalize: bool = True,
) -> DataFrame:
    """Winnowing fingerprint set per document: ``(id_col, h)`` rows,
    ``h`` the DISTINCT selected gram hashes. Documents with fewer than
    ``window`` grams (but at least one) emit their single minimum gram
    hash — exact copies of short documents still collide; documents
    shorter than ``width`` chars emit nothing."""
    if width < 1 or window < 1:
        raise ValueError(
            f"winnowed_fingerprints: width/window must be >= 1, got "
            f"{width}/{window}"
        )
    t = _norm(F.col(text_col), normalize=normalize)
    # TWO projections on purpose: the gram array (O(n) md5s) must land in
    # a real column before the sliding-min transform references it, or
    # the expression tree inlines it inside the lambda and every j
    # recomputes every gram — O(n²) md5s per row (measured: 4s for ONE
    # 300-char doc). CollapseProject leaves the split alone because the
    # alias is non-cheap and referenced several times downstream.
    base = df.select(F.col(id_col), _gram_hashes(t, width).alias("__g"))
    g = F.col("__g")
    n = F.size(g)
    selected = (
        F.when(
            n >= window,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n - window + 1),
                    lambda j: F.array_min(F.slice(g, j, window)),
                )
            ),
        )
        .when(n >= 1, F.array(F.array_min(g)))
        .otherwise(F.array().cast("array<bigint>"))
    )
    return base.select(F.col(id_col), F.explode(selected).alias("h"))


def shared_span_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    width: int = 24,
    window: int = 8,
    min_shared: int = 1,
    normalize: bool = True,
    max_bucket_rows: int = DEFAULT_MAX_BUCKET_ROWS,
    fps: DataFrame | None = None,
) -> DataFrame:
    """Document pairs sharing duplicated spans: ``(id_a, id_b,
    n_shared)`` with ``id_a < id_b`` and ``n_shared`` the number of
    winnowing fingerprints the two documents share (>= ``min_shared``).
    Every copied span of length >= ``width + window - 1`` chars is
    guaranteed to contribute at least one shared fingerprint, at any
    offset in either document; raise ``min_shared`` to demand longer or
    repeated duplication.

    ``fps`` lets a caller that already holds this corpus's
    :func:`winnowed_fingerprints` frame (same df/width/window/normalize)
    reuse it instead of re-fingerprinting — a pipeline computing several
    span surfaces pays the gram-hash pass once."""
    if fps is None:
        fps = winnowed_fingerprints(
            df, id_col, text_col,
            width=width, window=window, normalize=normalize,
        )
    pairs = bounded_self_join(
        fps, ["h"], order_col=id_col,
        max_bucket_rows=max_bucket_rows, materialize=False,
    ).select(
        F.col(f"a.`{id_col}`").alias("id_a"),
        F.col(f"b.`{id_col}`").alias("id_b"),
    )
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def shared_spans_incremental(
    new_df: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str,
    *,
    width: int = 24,
    window: int = 8,
    min_shared: int = 1,
    normalize: bool = True,
    broadcast_new: bool = True,
    new_fps: DataFrame | None = None,
) -> DataFrame:
    """Repeated-span detection of a NEW batch against a frozen corpus's
    persisted fingerprint table — the incremental sibling of
    :func:`shared_span_pairs`, same contract as ``dedup_incremental``:
    the corpus is never re-fingerprinted and corpus×corpus pairs are
    never generated.

    ``index`` is a ``(id_col, h)`` table as produced by
    :func:`winnowed_fingerprints` over the corpus (persist it once per
    corpus version; appending a batch to the corpus appends its
    fingerprints to the index — the rows are independent, no rebuild).
    Returns ``(new_id, corpus_id, n_shared)`` with ``n_shared >=
    min_shared`` counting shared fingerprints; the winnowing guarantee
    carries over — any copied span of length >= ``width + window - 1``
    chars between a new document and any corpus document produces at
    least one match.

    Scale shape: the new batch fingerprints per-row (zero shuffle),
    then ONE equi-join on the 8-byte hash against the index.
    ``broadcast_new`` hints the new side (a batch's fingerprint set is
    usually tiny next to a 100 TB corpus index, and broadcasting it
    turns the probe into a map-side scan of the index); pass False for
    batch sizes past broadcast limits and let AQE decide. ``new_fps``
    is the same reuse passthrough as :func:`shared_span_pairs`: a
    precomputed ``winnowed_fingerprints(new_df, ...)`` frame.
    """
    if new_fps is None:
        new_fps = winnowed_fingerprints(
            new_df, id_col, text_col,
            width=width, window=window, normalize=normalize,
        )
    fps = new_fps.select(F.col(id_col).alias("__new_id"), "h")
    if broadcast_new:
        fps = F.broadcast(fps)
    hits = index.select(
        F.col(id_col).alias("corpus_id"), "h"
    ).join(fps, "h")
    return (
        hits.groupBy(F.col("__new_id").alias("new_id"), "corpus_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
