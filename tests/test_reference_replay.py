"""Run the mined-reference-test replay harness as a suite gate.

tools/replay_reference_tests.py extracts every minable
invoke_scalar/assert pair from the reference's own unit tests and
replays it through this engine's SQL; the bar is ZERO mismatches
(documented divergences skip with a named reason, never silently).
"""

import json
import os
import subprocess
import sys

import pytest


def test_reference_replay_zero_mismatches():
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo unavailable")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(root, "tools",
                                      "replay_reference_tests.py")],
        capture_output=True, text=True, timeout=900, cwd=root)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no summary line:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    summary = json.loads(lines[0])
    assert summary["mismatch"] == 0, out.stdout[-3000:]
    assert summary["ok"] >= 45, summary   # extraction regression guard
