"""Conversation / instruction-tuning data preparation.

Post-training corpora are conversations — ``array<struct<role,content>>``
columns — not flat documents. Before such a corpus can be tokenized it
must be RENDERED (one training string per conversation, each turn
wrapped in role delimiters) and MASKED (supervised loss is computed only
on the assistant turns, so the trainer needs the exact span of every
turn's content inside the rendered string). Both are standard public
practice (the ChatML / sentencepiece-style role-delimiter recipes); the
reference has no conversation surface — this module is net-new
extension surface, like the rest of ``llmops``.

Scale shape: everything here is a per-row projection over the
conversation array using JVM higher-order functions (``transform`` /
``aggregate`` / ``filter``) — zero shuffle at any corpus size, no
Python in the row path. Span offsets are integer arithmetic over
``length()`` (Unicode code points, matching Python ``len``), so every
output column is engine-exact and safely hashable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "render_chat",
    "conversation_stats",
    "token_loss_mask",
]


def _turn_text(
    role: Column, content: Column, role_open: str, role_close: str,
    turn_end: str,
) -> Column:
    return F.concat(
        F.lit(role_open), role, F.lit(role_close), content, F.lit(turn_end)
    )


def render_chat(
    df: DataFrame,
    id_col: str,
    conv_col: str,
    *,
    role_open: str = "<|",
    role_close: str = "|>\n",
    turn_end: str = "<|end|>\n",
    mask_roles: tuple[str, ...] = ("assistant",),
) -> DataFrame:
    """Render each conversation to one training string and emit the
    loss-mask spans.

    ``conv_col`` must be ``array<struct<role string, content string>>``
    (extra struct fields are ignored; NULL role/content are rendered as
    empty strings — flag them first with :func:`conversation_stats`).
    Each turn renders as ``role_open + role + role_close + content +
    turn_end`` and turns concatenate in array order.

    Returns ``(id, text, n_turns, spans, mask_spans, n_mask_chars)``:

    - ``spans`` — ``array<struct<turn int, role string, start long,
      end long>>``, one per turn, where ``text[start:end)`` (0-based
      code-point offsets) is exactly that turn's ``content``. Computed
      by ONE integer fold over the array (a running offset), never by
      searching the rendered text — duplicate contents cannot mis-bind.
    - ``mask_spans`` — the subset whose role is in ``mask_roles``
      (default: assistant turns), i.e. where the trainer computes loss.
    - ``n_mask_chars`` — total masked content length, the cheap
      proxy trainers use to drop conversations with nothing to learn
      from (``n_mask_chars = 0``).
    """
    conv = F.coalesce(
        F.col(conv_col), F.array().cast(df.schema[conv_col].dataType)
    )
    role = lambda t: F.coalesce(t["role"], F.lit(""))  # noqa: E731
    content = lambda t: F.coalesce(t["content"], F.lit(""))  # noqa: E731

    text = F.aggregate(
        conv,
        F.lit("").cast("string"),
        lambda acc, t: F.concat(
            acc, _turn_text(role(t), content(t), role_open, role_close,
                            turn_end)
        ),
    )

    # one integer fold: acc = (next turn index, running offset, spans)
    head = len(role_open) + len(role_close)
    tail = len(turn_end)
    span_t = (
        "array<struct<turn:int,role:string,start:bigint,end:bigint>>"
    )
    zero = F.struct(
        F.lit(0).alias("i"),
        F.lit(0).cast("long").alias("off"),
        F.expr(f"CAST(array() AS {span_t})").alias("spans"),
    )

    def _step(acc, t):
        start = acc["off"] + F.length(role(t)) + F.lit(head)
        end = start + F.length(content(t))
        span = F.struct(
            acc["i"].alias("turn"),
            role(t).alias("role"),
            start.alias("start"),
            end.alias("end"),
        )
        return F.struct(
            (acc["i"] + 1).alias("i"),
            (end + tail).alias("off"),
            F.concat(acc["spans"], F.array(span)).alias("spans"),
        )

    spans = F.aggregate(conv, zero, _step)["spans"]
    roles = F.array(*[F.lit(r) for r in mask_roles])
    out = df.select(
        F.col(id_col),
        text.alias("text"),
        F.size(conv).alias("n_turns"),
        spans.alias("spans"),
    )
    mask = F.filter(F.col("spans"), lambda s: F.array_contains(
        roles, s["role"]
    ))
    return out.select(
        id_col,
        "text",
        "n_turns",
        "spans",
        mask.alias("mask_spans"),
        F.coalesce(
            F.aggregate(
                mask,
                F.lit(0).cast("long"),
                lambda a, s: a + (s["end"] - s["start"]),
            ),
            F.lit(0).cast("long"),
        ).alias("n_mask_chars"),
    )


def conversation_stats(
    df: DataFrame,
    id_col: str,
    conv_col: str,
    *,
    user_role: str = "user",
    assistant_role: str = "assistant",
    system_role: str = "system",
) -> DataFrame:
    """Per-conversation quality gates for instruction data.

    Returns one row per conversation: turn counts overall and per role,
    total content chars, and the three standard structural flags —

    - ``has_empty`` — any turn with NULL/empty content or role;
    - ``has_unknown_role`` — any role outside the three declared ones;
    - ``alternates`` — after at most ONE leading system turn, roles go
      user, assistant, user, assistant, … and the conversation ends on
      an assistant turn (the shape supervised fine-tuning expects).

    Zero shuffle: ``size(filter(...))`` projections plus one boolean
    fold for the alternation check. Feed the flags to the sync-filter
    stage to reject or message on malformed conversations.
    """
    conv = F.coalesce(
        F.col(conv_col), F.array().cast(df.schema[conv_col].dataType)
    )
    role = lambda t: F.coalesce(t["role"], F.lit(""))  # noqa: E731
    content = lambda t: F.coalesce(t["content"], F.lit(""))  # noqa: E731

    def count_role(r: str) -> Column:
        return F.size(F.filter(conv, lambda t: role(t) == r))

    body = F.when(
        (F.size(conv) > 0)
        & (F.element_at(conv, 1)["role"] == system_role),
        F.slice(conv, 2, F.greatest(F.size(conv) - 1, F.lit(0))),
    ).otherwise(conv)
    # fold: position parity must match user/assistant; acc = (idx, ok)
    alt_zero = F.struct(
        F.lit(0).alias("i"), F.lit(True).alias("ok")
    )

    def _alt(acc, t):
        want_user = acc["i"] % 2 == 0
        ok = acc["ok"] & F.when(
            want_user, role(t) == user_role
        ).otherwise(role(t) == assistant_role)
        return F.struct((acc["i"] + 1).alias("i"), ok.alias("ok"))

    alt = F.aggregate(body, alt_zero, _alt)
    alternates = (
        alt["ok"]
        & (F.size(body) > 0)
        & (F.size(body) % 2 == 0)  # ends on an assistant turn
    )
    known = F.array(
        F.lit(user_role), F.lit(assistant_role), F.lit(system_role)
    )
    return df.select(
        F.col(id_col),
        F.size(conv).alias("n_turns"),
        count_role(user_role).alias("n_user"),
        count_role(assistant_role).alias("n_assistant"),
        count_role(system_role).alias("n_system"),
        F.coalesce(
            F.aggregate(
                conv,
                F.lit(0).cast("long"),
                lambda a, t: a + F.length(content(t)),
            ),
            F.lit(0).cast("long"),
        ).alias("n_content_chars"),
        (
            F.size(
                F.filter(
                    conv,
                    lambda t: t["content"].isNull()
                    | (F.length(t["content"]) == 0)
                    | t["role"].isNull()
                    | (F.length(t["role"]) == 0),
                )
            )
            > 0
        ).alias("has_empty"),
        (
            F.size(
                F.filter(
                    conv, lambda t: ~F.array_contains(known, role(t))
                )
            )
            > 0
        ).alias("has_unknown_role"),
        alternates.alias("alternates"),
    )


def token_loss_mask(
    df: DataFrame,
    id_col: str,
    text_col: str,
    spans_col: str,
    *,
    mode: str = "overlap",
) -> DataFrame:
    """Bridge :func:`render_chat`'s CHARACTER spans to TOKEN positions:
    per-token start offsets plus a boolean loss mask, positionally
    aligned with the whitespace tokenization every downstream operator
    uses (``tokens_col`` — so ``encode_tokens``' id sequence and this
    mask zip together element-for-element).

    Offsets come from one integer fold: each token's position is the
    first occurrence at/after the previous token's end (`instr` on the
    remaining suffix). Between consecutive tokens there is only
    whitespace and tokens contain none, so that first occurrence IS the
    true position — duplicated token strings cannot mis-bind, same
    guarantee as render_chat's span fold.

    ``mode``: a token counts as masked when it ``"overlap"``\\ s a mask
    span (default — with marker-abutting templates the turn's last
    token merges with the end marker, and overlap keeps it in the
    loss) or only when fully ``"contained"`` in one.

    Returns ``(id, n_tokens, token_starts, loss_mask,
    n_loss_tokens)``. Zero shuffle; the fold's `instr` rescans at most
    the text once overall per row (each search starts where the last
    ended).
    """
    if mode not in ("overlap", "contained"):
        raise ValueError(
            f"mode must be 'overlap' or 'contained', got {mode!r}"
        )
    from data_validation_engine_spark.llmops.dedup import tokens_col

    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens_col(F.col(text_col))
    zero = F.struct(
        F.lit(0).cast("long").alias("pos"),
        F.expr("CAST(array() AS array<bigint>)").alias("starts"),
    )

    def _step(acc, t):
        # instr is 1-based on the suffix starting AFTER acc.pos
        start0 = (
            acc["pos"]
            + F.instr(F.substr(text, (acc["pos"] + 1).cast("int")), t)
            - 1
        )
        return F.struct(
            (start0 + F.length(t)).alias("pos"),
            F.concat(acc["starts"], F.array(start0)).alias("starts"),
        )

    starts = F.aggregate(toks, zero, _step)["starts"]
    # materialize the fold's output ONCE, then zip starts with tokens
    # for the mask: embedding `starts` inside a per-token lambda would
    # re-evaluate the whole O(n) fold per element (Spark does no
    # common-subexpression elimination inside HOF lambda bodies) —
    # O(n^2) per row on long conversations. CollapseProject keeps the
    # staged projection because the aliased fold is non-cheap and
    # multiply-referenced.
    staged = df.select(
        F.col(id_col),
        F.col(spans_col).alias("__spans"),
        toks.alias("__toks"),
        starts.alias("__starts"),
    )

    def _hit(s0, t):
        e0 = s0 + F.length(t)
        if mode == "overlap":
            return F.exists(
                F.col("__spans"),
                lambda sp: (s0 < sp["end"]) & (e0 > sp["start"]),
            )
        return F.exists(
            F.col("__spans"),
            lambda sp: (s0 >= sp["start"]) & (e0 <= sp["end"]),
        )

    mask = F.zip_with(F.col("__starts"), F.col("__toks"), _hit)
    return staged.select(
        F.col(id_col),
        F.size(F.col("__toks")).alias("n_tokens"),
        F.col("__starts").alias("token_starts"),
        mask.alias("loss_mask"),
        F.size(F.filter(mask, lambda m: m)).cast("long").alias(
            "n_loss_tokens"
        ),
    )
