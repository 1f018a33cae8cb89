"""Binary-file source: raw asset ingest for the multimodal pipeline.

Spark's built-in ``binaryFile`` format reads whole files as rows of
``(path, modificationTime, length, content: binary)`` — the natural
ingest for image/audio/video assets that downstream flow through
:mod:`~data_validation_engine_spark.llmops.multimodal` (typed metadata,
Arrow-batched decode plumbing). No reference counterpart (the reference
reads tabular text formats only, ``/root/reference/src/dve``); this is
the asset-side extension of SURVEY §2.1.

Scale notes: one Spark task per file (or per file-chunk for splittable
sources — binaryFile is NOT splittable, each file lands whole in one
row), so millions of small assets want
``spark.sql.files.maxPartitionBytes``-sized batching, which the format
does automatically by packing small files into shared partitions.
``pathGlobFilter`` prunes by extension at LISTING time (no content read
for filtered-out files); ``max_bytes`` guards the single-row blow-up an
oversized asset would cause (a 4 GiB video in one row kills an
executor — fail loudly at ingest instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_files(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = False,
    max_bytes: int | None = None,
    drop_content: bool = False,
) -> DataFrame:
    """Read files under ``path`` as ``(path, modificationTime, length,
    content)`` rows.

    ``glob`` filters file names at listing time (e.g. ``"*.png"``).
    ``max_bytes`` fails the job with a readable error if any file
    exceeds it (guard BEFORE the content column is consumed downstream).
    ``drop_content=True`` lists metadata only — the scan still avoids
    reading file bodies because the format prunes the ``content`` column.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    if max_bytes is not None:
        df = df.withColumn(
            "content",
            F.when(
                F.col("length") <= F.lit(int(max_bytes)), F.col("content")
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"binary file exceeds max_bytes={max_bytes}: "
                        ),
                        F.col("path"),
                        F.lit(" ("),
                        F.col("length").cast("string"),
                        F.lit(" bytes)"),
                    )
                )
            ),
        )
    if drop_content:
        df = df.drop("content")
    return df


def with_asset_metadata(df: DataFrame) -> DataFrame:
    """Derive the typed asset columns the multimodal operators key on:
    ``asset_name`` (file name), ``asset_ext`` (lowercased extension,
    empty when none), ``modality`` (image/audio/video/other by
    extension). Pure per-row projection."""
    ext = F.lower(
        F.when(
            F.col("path").rlike(r"\.[A-Za-z0-9]+$"),
            F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1),
        ).otherwise(F.lit(""))
    )
    modality = (
        F.when(
            ext.isin("png", "jpg", "jpeg", "gif", "bmp", "webp", "tiff"),
            F.lit("image"),
        )
        .when(ext.isin("wav", "mp3", "flac", "ogg", "m4a"), F.lit("audio"))
        .when(ext.isin("mp4", "mkv", "avi", "webm", "mov"), F.lit("video"))
        .otherwise(F.lit("other"))
    )
    return df.withColumns(
        {
            "asset_name": F.element_at(F.split(F.col("path"), "/"), -1),
            "asset_ext": ext,
            "modality": modality,
        }
    )
