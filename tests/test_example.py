"""Guard the shipped example against rot: run it as a subprocess exactly as

a user would (its own README-documented command line)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_example_runs_end_to_end():
    out = subprocess.run(
        [sys.executable, str(REPO / "examples/customer_orders/run.py")],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "master rows: 150" in out.stdout
