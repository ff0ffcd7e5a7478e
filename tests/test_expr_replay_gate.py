"""Run the reference's python expr/ DataFrame-DSL suite against the
user-facing API (sedona_db_spark/api) as a suite gate.

tools/replay_expr_plugin.py maps the ``sedonadb`` imports onto this
engine's API layer and skip-stubs sandbox-absent libs; the tests then run
under REAL pytest semantics.  The bar: zero failures, and a pass-count
floor so a collection regression can't silently pass."""

import os
import re
import subprocess
import sys

import pytest

EXPR_DIR = "/root/reference/python/sedonadb/tests/expr"


def test_expr_replay_green():
    if not os.path.isdir(EXPR_DIR):
        pytest.skip("reference repo unavailable")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{root}:{os.path.join(root, 'tools')}"
    out = subprocess.run(
        [sys.executable, "-m", "pytest", EXPR_DIR,
         "-p", "no:cacheprovider", "-p", "replay_expr_plugin", "-q"],
        capture_output=True, text=True, timeout=900, cwd=root, env=env)
    tail = out.stdout[-3000:]
    assert out.returncode == 0, f"{tail}\n{out.stderr[-2000:]}"
    m = re.search(r"(\d+) passed(?:, (\d+) skipped)?", out.stdout)
    assert m, tail
    passed = int(m.group(1))
    skipped = int(m.group(2) or 0)
    assert passed >= 225, (passed, tail)   # 231 at landing
    assert skipped <= 10, (skipped, tail)  # sandbox-lib skips only
