"""The in-repo lint gate stays green under pytest (the image ships no
black/mypy; tools/lint.py is the enforceable stand-in and CI runs it as
a hard gate)."""

import subprocess
import sys
from pathlib import Path


def test_lint_gate_clean():
    repo = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "tools" / "lint.py")],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
