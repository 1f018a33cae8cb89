"""Compression-ratio quality signal.

``deflate(text) / len(text)`` is a classic one-number text-quality
feature (used alongside repetition/perplexity in the Gopher and
RefinedWeb filtering stacks): highly repetitive or templated text
compresses far below ~0.4, while natural prose sits noticeably higher,
and random/encrypted blobs approach 1.0. It catches boilerplate the
n-gram repetition stats miss (long-range structure) at the cost of one
honest Python hop — zlib is C-implemented and the UDF is Arrow-batched,
the same declared-escape-hatch pattern as ``normalize_text``'s form
fold.

Scale shape: per-row projection, zero shuffle.

No reference counterpart (`/root/reference` has no corpus surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["compression_ratio"]


def compression_ratio(
    df: DataFrame,
    text_col: str,
    *,
    level: int = 6,
    output_col: str = "compression_ratio",
) -> DataFrame:
    """Attach ``len(zlib.compress(utf8(text))) / len(utf8(text))``.

    NULL and empty text yield NULL (no bytes to measure — let the
    quality gate treat absence separately from ratio thresholds).
    ``level`` is zlib's 1-9 speed/size dial; the DEFAULT (6) matches
    what the published filters report thresholds against. The ratio is
    deterministic for a given zlib build but NOT engine-portable (no
    SQL twin) — it is a scoring feature for threshold filters, like
    ``lm_perplexity``, not a hashable surface.
    """
    if not 1 <= level <= 9:
        raise ValueError(f"zlib level must be in 1..9, got {level}")
    import pandas as pd  # noqa: F401 — resolves the UDF type hints
    from pyspark.sql.functions import pandas_udf

    def _ratio(s):
        import zlib

        def one(x):
            if x is None:
                return None
            raw = x.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, level)) / len(raw)

        return s.map(one)

    _ratio.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = pandas_udf("double")(_ratio)
    return df.withColumn(output_col, udf(F.col(text_col)))
