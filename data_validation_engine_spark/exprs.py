"""Expression-language utilities.

The engine's expression language is Spark SQL itself (reference:
SURVEY.md §1.4; dve core_engine/type_hints.py:58-91). Step configs accept
"multiple expressions" in three shapes:

- a dict ``{expression: alias}`` (alias may be a list for multi-alias
  generators like ``posexplode``),
- a list of expression strings (each may carry its own ``AS alias``),
- one comma-delimited string, split with awareness of brackets, quoted
  strings, and backslash escapes (reference behaviour:
  dve backends/base/utilities.py:29-94 — re-implemented here as a single
  scanner, not copied).
"""

from __future__ import annotations

import warnings
from typing import Union

from data_validation_engine_spark.errors import ExpressionsMisparseWarning

ExpressionArray = list[str]
ExpressionMapping = dict[str, Union[str, list[str]]]
MultipleExpressions = Union[str, ExpressionArray, ExpressionMapping]

_OPEN = {"(": ")", "[": "]", "{": "}"}
_CLOSE = {v: k for k, v in _OPEN.items()}
_QUOTES = ("'", '"', "`")


def split_expressions(text: str) -> ExpressionArray:
    """Split one comma-delimited SQL string into individual expressions.

    Commas inside (), [], {}, quoted strings ('', "", ``) or escaped with a
    backslash never split. Emits :class:`ExpressionsMisparseWarning` when the
    scan ends inside a bracket/string/escape (the expression is still
    returned — Spark will produce the real parse error with context).
    """
    parts: ExpressionArray = []
    depth_stack: list[str] = []
    quote: str | None = None
    escaped = False
    start = 0

    for i, ch in enumerate(text):
        if escaped:
            escaped = False
            continue
        if ch == "\\":
            escaped = True
            continue
        if quote is not None:
            if ch == quote:
                quote = None
            continue
        if ch in _QUOTES:
            quote = ch
            continue
        if ch in _OPEN:
            depth_stack.append(ch)
            continue
        if ch in _CLOSE:
            if depth_stack and depth_stack[-1] == _CLOSE[ch]:
                depth_stack.pop()
            continue
        if ch == "," and not depth_stack:
            parts.append(text[start:i])
            start = i + 1

    problems = []
    if depth_stack:
        problems.append("unclosed brackets")
    if quote is not None:
        problems.append("unterminated string")
    if escaped:
        problems.append("trailing escape character")
    if problems:
        warnings.warn(
            "Possible expression misparse: " + "; ".join(problems),
            ExpressionsMisparseWarning,
            stacklevel=2,
        )

    parts.append(text[start:])
    return [p.strip() for p in parts if p.strip()]


def parse_multiple_expressions(expressions: MultipleExpressions) -> ExpressionArray:
    """Normalise any MultipleExpressions shape to a list of SQL expression
    strings with aliases baked in as ``expr AS alias``.

    Reference parity: dve spark/utilities.py:92-104 + type_hints.py:58-91.
    Multi-alias mapping values render as ``expr AS (a, b)`` (Spark's
    generator-alias syntax, e.g. ``posexplode(x) AS (pos, val)``).
    """
    if isinstance(expressions, str):
        return split_expressions(expressions)
    if isinstance(expressions, dict):
        rendered = []
        for expr, alias in expressions.items():
            if isinstance(alias, (list, tuple)):
                rendered.append(f"{expr} AS ({', '.join(alias)})")
            else:
                rendered.append(f"{expr} AS {alias}")
        return rendered
    # list — each element may itself be a comma-free expression already
    return [e.strip() for e in expressions if e and e.strip()]
