"""End-to-end training-corpus pipeline over the declared step
vocabulary: raw crawl (HTML + JSON sidecar) → text extraction →
normalization → quality scoring → exact dedup → leakage-safe split →
vocab/encode → pack materialization → deterministic shard export.

Every stage is a JSON-declarable step (or the documented export
function); the test proves the whole story COMPOSES — row counts and
tokens are conserved through each stage, duplicates actually collapse,
splits are disjoint, the export manifest reproduces bit-for-bit."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_validation_engine_spark.steps import StepEngine, parse_step


def _steps(eng, ents, configs):
    for c in configs:
        eng.evaluate(ents, config=parse_step(c))


def test_declared_corpus_pipeline(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # synthesize a crawl: real text wrapped in markup, a JSON sidecar,
    # and a planted duplicate slice (shifted ids) the dedup must collapse
    crawl = docs.selectExpr(
        "doc_id",
        "concat('<html><body><script>x=1</script><p>', text,"
        " '</p></body></html>') AS html",
        "concat('{\"lang\": \"', lang, '\"}') AS meta",
    )
    crawl = crawl.unionByName(
        crawl.where("doc_id % 7 = 0").selectExpr(
            "doc_id + 1000000 AS doc_id", "html", "meta"
        )
    )
    n_raw = crawl.count()
    n_planted = crawl.where("doc_id >= 1000000").count()

    eng = StepEngine(spark)
    ents = {"crawl": crawl}
    _steps(
        eng,
        ents,
        [
            {
                "operation": "extract_html_text",
                "entity_name": "crawl",
                "html_column": "html",
                "new_entity_name": "texts",
            },
            {
                "operation": "normalize_text",
                "entity_name": "texts",
                "text_column": "text",
                "collapse_whitespace": True,
                "new_entity_name": "clean",
            },
            {
                "operation": "parse_json",
                "entity_name": "clean",
                "json_column": "meta",
                "json_schema": "lang STRING",
                "new_entity_name": "typed",
            },
            {
                "operation": "compression_ratio",
                "entity_name": "typed",
                "new_entity_name": "scored",
            },
            # quality gate: drop rows that failed sidecar parsing or
            # compress suspiciously well (pure boilerplate)
            {
                "operation": "filter_without_notifying",
                "entity_name": "scored",
                "expression": (
                    "is_valid AND coalesce(compression_ratio, 0) > 0.05"
                    " AND length(text) > 0"
                ),
                "new_entity_name": "quality",
            },
            {
                "operation": "dedup_exact",
                "entity_name": "quality",
                "key_columns": ["text"],
                "order_column": "doc_id",
                "new_entity_name": "unique_docs",
            },
            {
                "operation": "hash_split",
                "entity_name": "unique_docs",
                "key_column": "doc_id",
                "splits": {"train": 0.9, "val": 0.1},
                "new_entity_name": "splits",
            },
        ],
    )
    quality = ents["quality"]
    unique_docs = ents["unique_docs"]
    assert quality.count() == n_raw  # synthetic crawl is all parseable
    # every planted duplicate collapsed onto its min-id original
    assert unique_docs.count() == n_raw - n_planted
    assert unique_docs.where("doc_id >= 1000000").count() == 0
    dup_counts = unique_docs.where("doc_id % 7 = 0 AND doc_id < 1000000")
    assert dup_counts.agg(F.min("n_copies")).first()[0] == 2

    splits = ents["splits"]
    counts = {
        r["split"]: r["n"]
        for r in splits.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {"train", "val"}
    assert counts["train"] + counts["val"] == unique_docs.count()

    # tokenizer prep + pack materialization on the train split
    _steps(
        eng,
        ents,
        [
            {
                "operation": "filter_without_notifying",
                "entity_name": "splits",
                "expression": "split = 'train'",
                "new_entity_name": "train",
            },
            {
                "operation": "build_vocab",
                "entity_name": "train",
                "id_column": "doc_id",
                "text_column": "text",
                "min_count": 2,
                "new_entity_name": "vocab",
            },
            {
                "operation": "encode_tokens",
                "entity_name": "train",
                "vocab_entity": "vocab",
                "id_column": "doc_id",
                "text_column": "text",
                "new_entity_name": "encoded",
            },
            {
                "operation": "materialize_packs",
                "entity_name": "encoded",
                "key_column": "doc_id",
                "ids_column": "ids_csv",
                "capacity": 256,
                "n_shards": 4,
                "pad_token_id": 0,
                "new_entity_name": "packs",
            },
        ],
    )
    encoded, packs = ents["encoded"], ents["packs"]
    tok_in = encoded.agg(F.sum("n_tokens")).first()[0]
    tok_out = packs.agg(F.sum("n_tokens")).first()[0]
    assert tok_in == tok_out  # packing conserves every token
    assert packs.where("size(input_ids) <> 256").count() == 0  # padded

    # deterministic shard export with a reproducible manifest
    from data_validation_engine_spark.scale import write_training_shards

    m1 = write_training_shards(
        ents["train"], str(tmp_path / "exp1"), "doc_id", n_shards=4
    ).collect()
    m2 = write_training_shards(
        ents["train"].repartition(5),
        str(tmp_path / "exp2"),
        "doc_id",
        n_shards=4,
    ).collect()
    assert [tuple(r) for r in m1] == [tuple(r) for r in m2]
    assert sum(r["n_rows"] for r in m1) == counts["train"]
