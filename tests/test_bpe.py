"""BPE tokenizer training (llmops/bpe.py) — pinned against an
independent pure-Python reference implementation, the attestation
strategy for the non-SQL-expressible iterative merge loop (the
corpus-facing round-1 pair statistics are DuckDB-oracled in the
bpe_pairstats driver row)."""

from __future__ import annotations

from collections import Counter

import pytest

from data_validation_engine_spark.llmops.bpe import (
    bpe_encode,
    bpe_train,
    word_frequencies,
)


def ref_bpe(texts: list[str], k: int, *, lowercase: bool = True):
    """Independent reference: textbook BPE with (count DESC, pair ASC)
    tiebreak and greedy left-to-right merge application."""
    wf = Counter(
        w for t in texts for w in (t.lower() if lowercase else t).split()
    )
    words = {w: list(w) for w in wf}
    merges: list[tuple[str, str]] = []
    for _ in range(k):
        pc: Counter = Counter()
        for w, f in wf.items():
            s = words[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        best = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best[1] < 2:
            break
        (a, b), _ = best
        merges.append((a, b))
        for w in words:
            s = words[w]
            out: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            words[w] = out
    return merges, words


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestBpeTrain:
    def test_textbook_corpus(self, spark):
        texts = [
            "low low low low low",
            "lower lower newest newest newest",
            "newest newest newest widest widest",
        ]
        ref, _ = ref_bpe(texts, 6)
        assert bpe_train(_df(spark, texts), "text", n_merges=6) == ref

    def test_overlap_is_greedy_left_to_right(self, spark):
        # aaaa + merge(a,a): greedy gives [aa, aa]; the pair (a,a)
        # counts 3 in 'aaaa' before merging
        texts = ["aaaa aaaa aaaa"]
        ref, ref_words = ref_bpe(texts, 2)
        got = bpe_train(_df(spark, texts), "text", n_merges=2)
        assert got == ref
        enc = bpe_encode(
            _df(spark, texts), "doc_id", "text", got
        ).first()
        assert enc.subwords_csv.split(" ")[0] == "▁".join(
            ref_words["aaaa"]
        )

    def test_stops_when_no_pair_repeats(self, spark):
        got = bpe_train(_df(spark, ["ab cd ef"]), "text", n_merges=10)
        assert got == []

    def test_random_corpora_match_reference(self, spark):
        import random

        rng = random.Random(8)
        alphabet = "abcde"
        for trial in range(3):
            texts = [
                " ".join(
                    "".join(
                        rng.choice(alphabet)
                        for _ in range(rng.randint(1, 6))
                    )
                    for _ in range(rng.randint(3, 12))
                )
                for _ in range(5)
            ]
            ref, _ = ref_bpe(texts, 5)
            got = bpe_train(_df(spark, texts), "text", n_merges=5)
            assert got == ref, texts

    def test_rejects_zero_merges(self, spark):
        with pytest.raises(ValueError):
            bpe_train(_df(spark, ["a"]), "text", n_merges=0)


class TestBpeEncode:
    def test_encode_matches_reference_words(self, spark):
        texts = ["banana bandana", "banana banana cabana"]
        ref, ref_words = ref_bpe(texts, 4)
        df = _df(spark, texts)
        got = bpe_train(df, "text", n_merges=4)
        assert got == ref
        enc = {
            r.doc_id: r.subwords_csv
            for r in bpe_encode(df, "doc_id", "text", got).collect()
        }
        assert enc[0] == " ".join(
            "▁".join(ref_words[w]) for w in texts[0].split()
        )

    def test_subword_counts_conserve_characters(self, spark):
        texts = ["hello world", "world hello hello"]
        df = _df(spark, texts)
        merges = bpe_train(df, "text", n_merges=3)
        for r in bpe_encode(df, "doc_id", "text", merges).collect():
            rebuilt = r.subwords_csv.replace("▁", "").split(" ")
            assert rebuilt == texts[r.doc_id].split()


class TestWordFrequencies:
    def test_counts(self, spark):
        wf = {
            r.word: r.freq
            for r in word_frequencies(
                _df(spark, ["a b a", "B a"]), "text"
            ).collect()
        }
        assert wf == {"a": 3, "b": 2}

    def test_case_preserving_mode(self, spark):
        wf = {
            r.word: r.freq
            for r in word_frequencies(
                _df(spark, ["a B a"]), "text", lowercase=False
            ).collect()
        }
        assert wf == {"a": 2, "B": 1}


def test_bpe_decode_round_trips_both_paths(spark, sf_dir):
    from pyspark.sql import functions as F

    from data_validation_engine_spark.llmops.bpe import (
        bpe_decode,
        bpe_encode,
        bpe_train,
    )
    from data_validation_engine_spark.llmops.dedup import tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).limit(100)
    merges, words = bpe_train(docs, "text", n_merges=8, return_words=True)

    want = {
        r["doc_id"]: r["w"]
        for r in docs.select(
            "doc_id",
            F.concat_ws(" ", tokens_col(F.lower(F.col("text")))).alias("w"),
        ).collect()
    }
    for enc in (
        bpe_encode(docs, "doc_id", "text", merges),
        bpe_encode(docs, "doc_id", "text", word_table=words),
    ):
        got = {
            r["doc_id"]: r["decoded"]
            for r in bpe_decode(enc).collect()
        }
        assert got == want
