"""Golden end-to-end replay: the live-loop scenario tool doubles as an
integration test (spike -> expand, observed-resize clock reset, cooldown
silence, idle shrink-to-min)."""

from __future__ import annotations

import subprocess
import sys

import pytest


@pytest.mark.slow
def test_live_loop_replay_golden(tmp_path):
    proc = subprocess.run(
        [sys.executable, "tools/replay_live_loop.py", "--keep", str(tmp_path)],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "matches the golden scenario" in proc.stdout
