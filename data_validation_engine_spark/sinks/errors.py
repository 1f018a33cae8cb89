"""Error feed sink: messages DataFrame -> JSONL, one distributed write.

Replaces the reference's background-thread row writer
(dve common/error_utils.py:30-173): messages are already a DataFrame, so
the feed is a single ``write.json`` — no queue, no driver serialisation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_messages_jsonl(
    messages: DataFrame, uri: str, *, mode: str = "append"
) -> None:
    messages.write.mode(mode).json(uri)
