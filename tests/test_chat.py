"""Conversation-prep operators (llmops/chat.py) pinned against a pure
pure-Python reference: render_chat's text/spans/mask and
conversation_stats' structural flags. The spans invariant is
self-verifying — text[start:end] must equal the turn's content."""

from __future__ import annotations

import pytest

from data_validation_engine_spark.llmops.chat import (
    conversation_stats,
    render_chat,
)
from data_validation_engine_spark.steps.engine import StepEngine
from data_validation_engine_spark.steps.configs import parse_step

ROLE_OPEN, ROLE_CLOSE, TURN_END = "<|", "|>\n", "<|end|>\n"

CONVS = [
    # well-formed: system + 2 exchange pairs
    (
        "c1",
        [
            ("system", "Be terse."),
            ("user", "hi"),
            ("assistant", "hello"),
            ("user", "2+2?"),
            ("assistant", "4"),
        ],
    ),
    # no system, one pair, unicode + repeated content across turns
    ("c2", [("user", "héllo wörld"), ("assistant", "héllo wörld")]),
    # malformed: empty content, unknown role, ends on user
    (
        "c3",
        [
            ("user", ""),
            ("tool", "SELECT 1"),
            ("assistant", "ok"),
            ("user", "bye"),
        ],
    ),
    # degenerate: empty conversation
    ("c4", []),
    # NULL content and NULL role
    ("c5", [("user", None), (None, "orphan")]),
]

SCHEMA = (
    "id string, conversation array<struct<role string, content string>>"
)


def _render_ref(turns):
    """Pure-Python reference rendering."""
    text, spans = "", []
    for i, (role, content) in enumerate(turns):
        role = role or ""
        content = content or ""
        text += ROLE_OPEN + role + ROLE_CLOSE
        spans.append((i, role, len(text), len(text) + len(content)))
        text += content + TURN_END
    return text, spans


@pytest.fixture(scope="module")
def conv_df(spark):
    return spark.createDataFrame(
        [(cid, [tuple(t) for t in turns]) for cid, turns in CONVS],
        SCHEMA,
    )


def test_render_chat_matches_python_reference(conv_df):
    got = {
        r["id"]: r
        for r in render_chat(conv_df, "id", "conversation").collect()
    }
    for cid, turns in CONVS:
        text, spans = _render_ref(turns)
        row = got[cid]
        assert row["text"] == text, cid
        assert row["n_turns"] == len(turns)
        assert [
            (s["turn"], s["role"], s["start"], s["end"])
            for s in row["spans"]
        ] == spans
        # the self-verifying invariant: every span slices to its content
        for (_, content), s in zip(turns, row["spans"]):
            assert text[s["start"] : s["end"]] == (content or "")
        mask = [s for s in spans if s[1] == "assistant"]
        assert [
            (s["turn"], s["role"], s["start"], s["end"])
            for s in row["mask_spans"]
        ] == mask
        assert row["n_mask_chars"] == sum(e - s for _, _, s, e in mask)


def test_render_chat_custom_mask_roles(conv_df):
    rows = render_chat(
        conv_df, "id", "conversation", mask_roles=("assistant", "tool")
    ).collect()
    by_id = {r["id"]: r for r in rows}
    assert {s["role"] for s in by_id["c3"]["mask_spans"]} == {
        "tool",
        "assistant",
    }
    assert by_id["c4"]["n_mask_chars"] == 0


def test_conversation_stats_flags(conv_df):
    got = {
        r["id"]: r
        for r in conversation_stats(conv_df, "id", "conversation").collect()
    }
    c1 = got["c1"]
    assert (
        c1["n_turns"],
        c1["n_user"],
        c1["n_assistant"],
        c1["n_system"],
    ) == (5, 2, 2, 1)
    assert c1["alternates"] and not c1["has_empty"]
    assert not c1["has_unknown_role"]
    assert c1["n_content_chars"] == sum(
        len(c or "") for _, c in CONVS[0][1]
    )

    c2 = got["c2"]
    assert c2["alternates"] and c2["n_system"] == 0

    c3 = got["c3"]
    assert c3["has_empty"] and c3["has_unknown_role"]
    assert not c3["alternates"]  # tool turn breaks alternation

    c4 = got["c4"]
    assert c4["n_turns"] == 0 and not c4["alternates"]
    assert not c4["has_empty"]

    c5 = got["c5"]
    assert c5["has_empty"] and not c5["alternates"]
    assert c5["n_content_chars"] == len("orphan")


def test_chat_steps_declared(spark, conv_df):
    eng = StepEngine(spark)
    ents = {"convs": conv_df}
    eng.evaluate(
        ents,
        config=parse_step(
            {
                "operation": "render_chat",
                "entity_name": "convs",
                "key_column": "id",
                "conversation_column": "conversation",
                "new_entity_name": "rendered",
            }
        ),
    )
    eng.evaluate(
        ents,
        config=parse_step(
            {
                "operation": "conversation_stats",
                "entity_name": "convs",
                "key_column": "id",
                "conversation_column": "conversation",
                "new_entity_name": "stats",
            }
        ),
    )
    joined = ents["rendered"].join(ents["stats"], "id")
    rows = {r["id"]: r for r in joined.collect()}
    assert rows["c1"]["n_mask_chars"] > 0
    # stats' char total equals the sum of rendered span widths
    for cid, _ in CONVS:
        r = rows[cid]
        assert r["n_content_chars"] == sum(
            s["end"] - s["start"] for s in r["spans"]
        )


def test_render_chat_zero_shuffle(conv_df):
    plan = render_chat(
        conv_df, "id", "conversation"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    st = conversation_stats(
        conv_df, "id", "conversation"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in st


class TestTokenLossMask:
    def test_offsets_exact_and_mask_modes(self, spark, conv_df):
        from data_validation_engine_spark.llmops.chat import (
            render_chat,
            token_loss_mask,
        )

        rendered = render_chat(conv_df, "id", "conversation")
        out = token_loss_mask(rendered, "id", "text", "mask_spans")
        rows = {r["id"]: r for r in out.collect()}
        texts = {r["id"]: r for r in rendered.collect()}
        import re

        for cid, r in rows.items():
            text = texts[cid]["text"]
            # offsets reproduce tokens_col exactly: full-whitespace
            # trim, so the template's trailing \n contributes NO
            # phantom empty token — the same sequence encode_tokens
            # sees (alignment is the whole point of this operator)
            stripped = text.strip()
            toks = re.split(r"\s+", stripped) if stripped else []
            assert r["n_tokens"] == len(toks)
            for i, s in enumerate(r["token_starts"]):
                assert text[s : s + len(toks[i])] == toks[i], (cid, i)
            # overlap mode: every token overlapping an assistant span
            # is in the loss
            spans = [
                (sp["start"], sp["end"]) for sp in texts[cid]["mask_spans"]
            ]
            for i, s in enumerate(r["token_starts"]):
                e = s + len(toks[i])
                want = any(s < b and e > a for a, b in spans)
                assert r["loss_mask"][i] == want, (cid, i)
            assert r["n_loss_tokens"] == sum(r["loss_mask"])

    def test_contained_mode_drops_straddlers(self, spark, conv_df):
        from data_validation_engine_spark.llmops.chat import (
            render_chat,
            token_loss_mask,
        )

        rendered = render_chat(conv_df, "id", "conversation")
        over = token_loss_mask(
            rendered, "id", "text", "mask_spans", mode="overlap"
        )
        cont = token_loss_mask(
            rendered, "id", "text", "mask_spans", mode="contained"
        )
        n_over = {r["id"]: r["n_loss_tokens"] for r in over.collect()}
        n_cont = {r["id"]: r["n_loss_tokens"] for r in cont.collect()}
        # the default template abuts content with <|end|>, so the last
        # token of each assistant turn straddles: contained < overlap
        assert n_cont["c1"] < n_over["c1"]
        for cid in n_over:
            assert n_cont[cid] <= n_over[cid]

        import pytest as _pytest

        with _pytest.raises(ValueError, match="mode"):
            token_loss_mask(rendered, "id", "text", "mask_spans", mode="x")

    def test_duplicate_tokens_bind_in_order(self, spark):
        from data_validation_engine_spark.llmops.chat import (
            token_loss_mask,
        )

        # same token repeated; spans target the SECOND occurrence only
        df = spark.createDataFrame(
            [("d", "foo bar foo bar foo")],
            "id string, text string",
        ).selectExpr(
            "id",
            "text",
            "array(named_struct('start', CAST(8 AS BIGINT),"
            " 'end', CAST(11 AS BIGINT))) AS mask_spans",
        )
        r = token_loss_mask(df, "id", "text", "mask_spans").first()
        assert list(r["token_starts"]) == [0, 4, 8, 12, 16]
        assert list(r["loss_mask"]) == [False, False, True, False, False]

    def test_zero_shuffle(self, spark, conv_df):
        from data_validation_engine_spark.llmops.chat import (
            render_chat,
            token_loss_mask,
        )

        rendered = render_chat(conv_df, "id", "conversation")
        plan = token_loss_mask(
            rendered, "id", "text", "mask_spans"
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "EvalPython" not in plan
