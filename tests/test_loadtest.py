"""scripts/loadtest.py smoke: the offered-load driver end-to-end on the
tiny CPU config, including the --zero-llm speculative upper-bracket
workload (constant logits -> repetitive generation -> prompt-lookup
accepts ~all drafts), which is how the serving record measures a real
acceptance rate without published weights (PERF.md round 5)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "loadtest.py")


@pytest.mark.parametrize("zero_llm", [False, True])
def test_loadtest_tiny_engine_spec(zero_llm):
    cmd = [
        sys.executable, SCRIPT, "--tiny", "--mode", "engine",
        "--spec", "2", "--clients", "2", "--requests", "4",
        "--max-new", "12",
    ]
    if zero_llm:
        cmd.append("--zero-llm")
    r = subprocess.run(
        cmd, capture_output=True, text=True, timeout=900,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["completed"] == 4 and rec["errors"] == 0, rec
    spec = rec["backend_stats"]["spec"]
    assert spec["drafted"] > 0
    if zero_llm:
        # constant logits: once the constant token enters the lookup
        # window every draft verifies — acceptance must be near-total
        assert spec["accepted"] >= 0.8 * spec["drafted"], spec
