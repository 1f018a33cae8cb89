"""Round-11 staged rows: every r10-new operator's oracle twin must be
green BEFORE it rides the driver roster (the pre-promotion gate —
subprocess through tools/oracle_check.py --staged, the exact
comparison pipeline the real rows use)."""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_staged_rows_green():
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "oracle_check.py"),
            "--staged",
            "/root/testdata/sf0.001",
        ],
        env=dict(os.environ),
        capture_output=True,
        text=True,
        timeout=540,
        cwd=REPO,
    )
    tail = "\n".join(proc.stdout.splitlines()[-8:])
    assert proc.returncode == 0, f"staged sweep failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert "failures: 0" in proc.stdout, tail
    assert "FAIL" not in proc.stdout, tail
