"""Record linkage: blocked fuzzy string matching (edit distance).

A validation engine's natural companion problem: match submitted records
against a reference register when the join key is a human-typed string
(names, addresses, org codes). The exact formulation — all pairs with
``levenshtein(a, b) <= d`` — is a cartesian product, unusable beyond toy
sizes. The standard industrial answer (Fellegi-Sunter style blocking) is
BLOCK + VERIFY, the same candidates-then-exact-check shape as this
engine's MinHash/SimHash dedup:

- **block**: candidates are pairs agreeing on a deterministic blocking
  key — here the first ``prefix_len`` chars of the casefolded, trimmed
  string. This is the operator's *contract* (recall is bounded by the
  blocking choice, exactly like LSH banding bounds MinHash recall);
  the oracle reproduces the same blocks, so the pair set is exact BY
  DEFINITION and engine-checkable.
- **verify**: exact Levenshtein distance (`F.levenshtein`, identical
  classic DP metric in every engine) plus the length-band prefilter
  ``|len(a) - len(b)| <= d`` — a necessary condition for distance <= d,
  so it prunes candidates without changing the result.

Scale shape: ONE equi-join on the block key; neither side ever
cross-joins. Hot blocks (common prefixes — "ca" in customer names) are
decomposed EXACTLY via length bucketing: the left row joins its own
``floor(len / width)`` bucket, the right row is replicated to the
buckets its length can pair with (``floor((len - d) / width) ..
floor((len + d) / width)`` — at most ``d / width + 2`` copies), turning
one hot block into many bounded ones with zero pair loss and zero pair
duplication (a left row lives in exactly one bucket).

The reference has no fuzzy-match surface (exact-key joins only,
dve spark/rules.py:339-418); net-new extension per SURVEY §8.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm(col: Column) -> Column:
    return F.lower(F.trim(F.coalesce(col, F.lit(""))))


def block_key(col: Column, *, prefix_len: int = 2) -> Column:
    """Deterministic blocking key: first ``prefix_len`` chars of the
    casefolded, trimmed string. NULL and blank strings are EXCLUDED from
    matching entirely (record-linkage convention: missing != missing —
    scoring two absent names as a distance-0 match would weld unrelated
    records into one cluster, and the shared empty block would be a
    quadratic hot spot no length bucket can split)."""
    return F.substring(_norm(col), 1, prefix_len)


def fuzzy_string_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    *,
    max_distance: int = 2,
    prefix_len: int = 2,
    length_bucket: int | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs that share a block and sit within
    ``max_distance`` edits, with the match distance attached.

    Output = left columns + right columns renamed ``{prefix}{name}`` +
    ``distance`` (int). The comparison runs on the casefolded trimmed
    strings (the blocking normalisation) so "Smith " matches "smith".
    Rows whose key is NULL or blank after normalisation are excluded
    from both sides (missing != missing; see :func:`block_key`).

    ``length_bucket`` (chars) splits hot blocks by string length with
    exact right-side replication — same result set, bounded per-task
    input; leave ``None`` for small/benign key distributions.
    """
    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    reserved = {"distance", "__bk", "__ln", "__lb", "__rn"}
    clashes = (reserved & set(left.columns)) | {
        f"{prefix}{c}" for c in right.columns if f"{prefix}{c}" in reserved
    }
    if clashes:
        raise ValueError(
            f"input columns collide with fuzzy-join outputs/helpers "
            f"{sorted(clashes)}; rename them first"
        )
    d = int(max_distance)
    lkey = block_key(F.col(left_col), prefix_len=prefix_len)
    rkey = block_key(F.col(right_col), prefix_len=prefix_len)
    lhs = (
        left.withColumn("__bk", lkey)
        .withColumn("__ln", F.length(_norm(F.col(left_col))))
        .where(F.col("__ln") > 0)
    )
    renamed = right.select(
        [F.col(c).alias(f"{prefix}{c}") for c in right.columns]
    )
    rhs = (
        renamed.withColumn(
            "__bk",
            block_key(F.col(f"{prefix}{right_col}"), prefix_len=prefix_len),
        )
        .withColumn("__rn", F.length(_norm(F.col(f"{prefix}{right_col}"))))
        .where(F.col("__rn") > 0)
    )

    join_keys = ["__bk"]
    if length_bucket is not None:
        w = int(length_bucket)
        if w < 1:
            raise ValueError(f"length_bucket must be >= 1, got {w}")
        lhs = lhs.withColumn("__lb", F.floor(F.col("__ln") / w))
        # replicate each right row into every left-bucket its length can
        # reach: floor((rn - d)/w) .. floor((rn + d)/w); a left row has
        # exactly one bucket, so no candidate pair appears twice
        rhs = rhs.withColumn(
            "__lb",
            F.explode(
                F.sequence(
                    F.floor((F.col("__rn") - d) / w),
                    F.floor((F.col("__rn") + d) / w),
                )
            ),
        )
        join_keys.append("__lb")

    verified = (
        lhs.join(rhs, on=join_keys, how="inner")
        .where(F.abs(F.col("__ln") - F.col("__rn")) <= d)
        .withColumn(
            "distance",
            F.levenshtein(
                _norm(F.col(left_col)), _norm(F.col(f"{prefix}{right_col}"))
            ),
        )
        .where(F.col("distance") <= d)
    )
    keep = (
        list(left.columns)
        + [f"{prefix}{c}" for c in right.columns]
        + ["distance"]
    )
    return verified.select(*keep)


def fuzzy_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_distance: int = 2,
    prefix_len: int = 2,
    length_bucket: int | None = None,
) -> DataFrame:
    """Within-frame near-duplicate pairs by edit distance: the self-join
    variant of :func:`fuzzy_string_join`, deduplicated to ``id_a <
    id_b``. Returns ``(id_a, id_b, distance)``."""
    pairs = fuzzy_string_join(
        df.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("__t")),
        df.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("__t")),
        "__t",
        "__t",
        max_distance=max_distance,
        prefix_len=prefix_len,
        length_bucket=length_bucket,
        prefix="r_",
    )
    return pairs.where(F.col("id_a") < F.col("r_id_b")).select(
        "id_a", F.col("r_id_b").alias("id_b"), "distance"
    )
