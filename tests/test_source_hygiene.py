"""Source hygiene: no invisible control characters in Python sources.

A literal \\x01 crept into a concat_ws separator once this round —
invisible in every editor view, it silently changed rolling-hash
boundaries until the DuckDB twin caught the divergence. This lint
makes that class structural: any C0 control character (except
tab/newline) in a tracked .py file fails, minus the explicit
allowlist of documented intentional uses.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

#: (path, count) — documented intentional control chars
ALLOWED = {
    # dedup key-part separator: joins md5 key parts unambiguously and
    # is documented in the docstring + replayed via chr(1) in oracles
    "data_validation_engine_spark/llmops/dedup.py": 1,
}

_CTL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")


def test_no_stray_control_characters():
    bad = []
    for p in REPO.rglob("*.py"):
        rel = p.relative_to(REPO).as_posix()
        if ".git" in rel or rel.startswith((".claude/", "build/")):
            continue
        hits = _CTL.findall(p.read_text(encoding="utf-8"))
        allowed = ALLOWED.get(rel, 0)
        if len(hits) != allowed:
            bad.append((rel, len(hits), allowed, [hex(ord(c)) for c in hits[:5]]))
    assert not bad, f"stray control characters: {bad}"


def test_repo_compiles_with_warnings_as_errors():
    """Every repo source compiles under -W error (r11 verdict,
    Next-round #4): an invalid escape sequence is a DeprecationWarning
    today and a SyntaxError on a future Python — fail it now, at
    compile time, where the fix is a one-char raw-string prefix."""
    import py_compile
    import warnings

    bad = []
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        for p in REPO.rglob("*.py"):
            rel = p.relative_to(REPO).as_posix()
            if ".git" in rel or rel.startswith((".claude/", "build/", "spark-warehouse/")):
                continue
            try:
                py_compile.compile(str(p), doraise=True, quiet=2)
            except Exception as exc:  # noqa: BLE001 — collect all
                bad.append((rel, str(exc)[:160]))
    assert not bad, f"compile warnings/errors: {bad}"
