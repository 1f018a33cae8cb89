"""Round-13 extras: the Gopher document-quality gate (Rae 2021 §A1.1)
and the IVF cell-occupancy gauge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_validation_engine_spark.llmops.gopher import (
    GOPHER_STOP_WORDS,
    gopher_quality_flags,
)
from data_validation_engine_spark.llmops.ivf import (
    default_centroids,
    ivf_assign,
    ivf_stats,
)

GOOD = (
    "The quick brown fox jumps over the lazy dog and then decides "
    "that it would have been wiser to rest with friends. "
) * 5  # 110 words, all rules pass


def _flags(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return gopher_quality_flags(df, "text", **kw).collect()[0]


def test_good_document_passes_all_rules(spark):
    r = _flags(spark, GOOD)
    assert r["gopher_keep"] is True
    assert r["gopher_words"] == 110  # 22 words x 5 repeats
    assert r["gopher_stop_words"] >= 4


def test_word_count_bounds(spark):
    r = _flags(spark, "too short to pass")
    assert r["flag_word_count"] is False and r["gopher_keep"] is False
    r = _flags(spark, GOOD, max_words=50)
    assert r["flag_word_count"] is False


def test_mean_word_len_and_symbols(spark):
    # mean word length 1 -> fail
    r = _flags(spark, " ".join(["a"] * 60))
    assert r["flag_mean_word_len"] is False
    # heavy hash/ellipsis symbols -> symbol ratio fail
    spam = GOOD + " " + "# … ... # #" * 5
    r = _flags(spark, spam)
    assert r["gopher_symbol_ratio"] > 0.1
    assert r["flag_symbol_ratio"] is False


def test_bullet_and_ellipsis_lines(spark):
    bullets = "\n".join(f"• item {i} of the list" for i in range(10))
    r = _flags(spark, bullets, min_words=10)
    assert r["gopher_bullet_frac"] == 1.0
    assert r["flag_bullet_lines"] is False
    dots = "\n".join(
        f"trailing thought number {i} goes on and on..." for i in range(10)
    )
    r = _flags(spark, dots, min_words=10)
    assert r["gopher_ellipsis_frac"] == 1.0
    assert r["flag_ellipsis_lines"] is False
    # single-line GOOD text: line rules pass
    r = _flags(spark, GOOD)
    assert r["flag_bullet_lines"] is True
    assert r["flag_ellipsis_lines"] is True


def test_alpha_words_and_stop_words(spark):
    numbers = " ".join(str(i) for i in range(60))
    r = _flags(spark, numbers)
    assert r["gopher_alpha_frac"] == 0.0
    assert r["flag_alpha_words"] is False
    assert r["flag_stop_words"] is False
    # stop-word count is DISTINCT hits from the paper list
    r = _flags(spark, "the the the the " + "word " * 50, min_words=10)
    assert r["gopher_stop_words"] == 1
    assert r["flag_stop_words"] is False
    assert set(GOPHER_STOP_WORDS) == {
        "the", "be", "to", "of", "and", "that", "have", "with"
    }


def test_null_text_fails_closed(spark):
    df = spark.createDataFrame(
        [(1, None), (2, GOOD)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r for r in gopher_quality_flags(df, "text").collect()
    }
    assert got[1]["gopher_keep"] is False
    assert got[1]["flag_word_count"] is False
    assert got[2]["gopher_keep"] is True


def test_gate_is_zero_shuffle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        gopher_quality_flags(docs, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # per-row projection only
    # the synthetic corpus is a technical-word bag (few Gopher stop
    # words, 10-99 words/doc) — paper defaults reject ALL of it (the
    # honest outcome); relaxed thresholds exercise both outcomes
    out = gopher_quality_flags(
        docs, "text", min_words=30, min_stop_words=1
    )
    assert out.count() == docs.count()
    kept = out.where("gopher_keep").count()
    assert 0 < kept < docs.count()


# --- ivf_stats ------------------------------------------------------------


def test_ivf_stats_counts_and_hot(spark):
    rows = (
        [(i, [0.0, 0.0]) for i in range(2)]        # near centroid 0
        + [(10 + i, [10.0, 10.0]) for i in range(18)]  # hot cell
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[0.0, 0.0], [10.0, 10.0], [99.0, 99.0], [55.0, 55.0]]
    got = {r["cell"]: r for r in ivf_stats(df, cents).collect()}
    assert set(got) == {0, 1}  # empty cells absent
    assert got[0]["n_rows"] == 2 and got[1]["n_rows"] == 18
    assert abs(got[1]["frac"] - 0.9) < 1e-12
    # uniform share = 5 rows/cell; hot_factor 4 -> hot iff n > 20?? no:
    # n * k > factor * total  ->  18 * 4 = 72 > 4 * 20 = 80 is False;
    # with factor 3: 72 > 60 -> hot
    assert got[1]["hot"] is False
    got3 = {
        r["cell"]: r for r in ivf_stats(df, cents, hot_factor=3.0).collect()
    }
    assert got3[1]["hot"] is True and got3[0]["hot"] is False


def test_ivf_stats_persisted_layout_and_validation(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    cents = [[0.0, 0.0], [7.0, 0.0]]
    assigned = ivf_assign(df, cents, cell_col="c")
    a = sorted(
        map(tuple, ivf_stats(df, cents).collect())
    )
    b = sorted(
        map(
            tuple,
            ivf_stats(assigned, cell_col="c", n_cells=2).collect(),
        )
    )
    assert a == b
    with pytest.raises(ValueError, match="exactly one"):
        ivf_stats(df)
    with pytest.raises(ValueError, match="needs n_cells"):
        ivf_stats(assigned, cell_col="c")


def test_declared_gopher_step_composes_with_filter(spark, sf_dir):
    from data_validation_engine_spark.steps import StepEngine, parse_step

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    eng = StepEngine(spark)
    ents = {"docs": docs}
    eng.evaluate(
        ents,
        config=parse_step(
            {
                "operation": "gopher_quality_flags",
                "entity_name": "docs",
                "min_words": 30,
                "min_stop_words": 1,
                "new_entity_name": "flagged",
            }
        ),
    )
    eng.evaluate(
        ents,
        config=parse_step(
            {
                "operation": "filter",
                "entity_name": "flagged",
                "expression": "gopher_keep",
            }
        ),
    )
    n_kept = ents["flagged"].count()
    assert 0 < n_kept < docs.count()
    lib = gopher_quality_flags(
        docs, "text", min_words=30, min_stop_words=1
    ).where("gopher_keep")
    assert n_kept == lib.count()


# --- C4 cleaning -----------------------------------------------------------


PROSE = "This sentence is long enough to keep and it ends properly."


def _c4(spark, text, **kw):
    from data_validation_engine_spark.llmops.c4 import c4_clean

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return c4_clean(df, "text", **kw).collect()[0]


def test_c4_line_rules(spark):
    text = "\n".join(
        [
            PROSE,                           # kept
            "no terminal punctuation here",  # dropped: no punct
            "Too short.",                    # dropped: < 3 words
            "Enable JavaScript to view this page.",  # dropped: js rule
            'He said "stop" and left. "Quoted line ends with a quote."',
            PROSE,
        ]
    )
    r = _c4(spark, text, min_sentences=3)
    kept_lines = r["c4_text"].split("\n")
    assert len(kept_lines) == 3
    assert r["c4_lines_total"] == 6 and r["c4_lines_kept"] == 3
    assert r["c4_keep"] is True


def test_c4_quote_terminated_sentences(spark):
    # a kept line ending in a BARE end quote counts as one sentence;
    # a '."' ending is not double-counted
    r = _c4(spark, 'Then she said to everyone "go away now"')
    assert r["c4_lines_kept"] == 1 and r["c4_sentences"] == 1
    r = _c4(spark, 'He finished with the words "that is all."')
    assert r["c4_lines_kept"] == 1 and r["c4_sentences"] == 1
    # dialogue-style prose passes the page floor it used to fail
    dialogue = "\n".join(
        [f'Speaker number {i} said clearly "line {i} here"' for i in range(5)]
    )
    r = _c4(spark, dialogue)
    assert r["c4_sentences"] == 5 and r["c4_keep"] is True


def test_c4_page_rules(spark):
    good = "\n".join([PROSE] * 6)
    assert _c4(spark, good)["c4_keep"] is True
    assert _c4(spark, good + "\nlorem ipsum dolor.")["c4_has_lorem"] is True
    assert _c4(spark, good + "\nLorem Ipsum.")["c4_keep"] is False
    assert _c4(spark, good + "\nvar x = {;")["c4_keep"] is False
    # sentence floor on the CLEANED text
    r = _c4(spark, "\n".join([PROSE] * 3))
    assert r["c4_sentences"] == 3 and r["c4_keep"] is False


def test_c4_null_and_empty_fail_closed(spark):
    from data_validation_engine_spark.llmops.c4 import c4_clean

    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    for r in c4_clean(df, "text").collect():
        assert r["c4_text"] == "" and r["c4_keep"] is False


def test_c4_zero_shuffle_on_corpus(spark, sf_dir):
    from data_validation_engine_spark.llmops.c4 import c4_clean

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = c4_clean(docs, "text", min_line_words=2, min_sentences=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert out.count() == docs.count()


# --- streaming lift: the gates are stateless projections ------------------


def test_gopher_and_c4_stream_equals_batch(spark, sf_dir, tmp_path):
    """Both crawl filters are watermark-free per-row projections, so
    they lift onto readStream unchanged — streaming output must equal
    the batch twin row-for-row."""
    import shutil

    from data_validation_engine_spark.llmops.c4 import c4_clean

    src = tmp_path / "docs_src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", src / "part-0.parquet")
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    batch = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def pipe(df):
        flagged = gopher_quality_flags(
            df, "text", min_words=30, min_stop_words=1
        )
        return c4_clean(
            flagged, "text", min_line_words=2, min_sentences=1
        ).select(
            "doc_id", "gopher_keep", "gopher_words", "c4_keep",
            "c4_lines_kept", "c4_sentences",
        )

    out = str(tmp_path / "out")
    q = (
        pipe(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    want = pipe(batch)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
