"""Hang-proofing of the driver bench (bench.py driver mode).

Round 3 lost its entire perf record to ONE hung remote compile (rc=124,
no output). These tests drive the real driver code path in fake mode
(UFVIDEO_BENCH_FAKE=1 — instant stub measurements, no jax) and assert the
three guarantees:

1. a clean run emits one JSON record with every mode live;
2. a mode that hangs dies at its per-mode deadline and degrades to its
   stale RECORDED value while later modes still run live;
3. SIGTERM mid-suite (what the external `timeout` sends) still yields a
   valid JSON record with live values for the modes that finished.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

BENCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
)


def _env(**extra):
    env = dict(os.environ)
    env["UFVIDEO_BENCH_FAKE"] = "1"
    env.update({k: str(v) for k, v in extra.items()})
    return env


def _last_json(stdout: str) -> dict:
    lines = [l for l in stdout.strip().splitlines() if l.strip()]
    assert lines, f"no output: {stdout!r}"
    return json.loads(lines[-1])


def _json_lines(stdout: str):
    out = []
    for l in stdout.strip().splitlines():
        try:
            out.append(json.loads(l))
        except ValueError:
            pass
    return out


@pytest.mark.smoke
def test_driver_clean_run_all_live():
    r = subprocess.run(
        [sys.executable, BENCH], env=_env(), capture_output=True, text=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    recs = _json_lines(r.stdout)
    assert len(recs) == 1, f"driver must print exactly one JSON line: {r.stdout!r}"
    rec = recs[0]
    assert rec["metric"] == "qwen2_7b_decode_tokens_per_sec"
    assert "stale" not in rec and "partial" not in rec
    # every extra metric upgraded from its stale fallback to a live number
    for name, val in rec["extra"].items():
        assert not isinstance(val, dict), f"{name} stayed stale: {val}"


@pytest.mark.smoke
def test_driver_hung_mode_degrades_to_stale():
    """A hang in one mode (simulated stuck compile) must not erase the
    record: that mode falls back stale-flagged, later modes run live."""
    r = subprocess.run(
        [sys.executable, BENCH],
        env=_env(
            UFVIDEO_BENCH_FAKE_HANG="decode_int8_spec_best",
            UFVIDEO_BENCH_DEADLINE="2",
        ),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = _last_json(r.stdout)
    hung = rec["extra"]["qwen2_7b_decode_int8_spec4_best_tokens_per_sec"]
    assert isinstance(hung, dict) and hung["stale"] and "error" in hung
    # a later mode in DRIVER_EXTRA_MODES still measured live
    assert not isinstance(rec["extra"]["sam2_encode_frames_per_sec"], dict)
    assert "partial" not in rec


@pytest.mark.smoke
def test_driver_hung_headline_keeps_extras_live():
    r = subprocess.run(
        [sys.executable, BENCH],
        env=_env(UFVIDEO_BENCH_FAKE_HANG="decode", UFVIDEO_BENCH_DEADLINE="2"),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = _last_json(r.stdout)
    assert rec["stale"] is True and "headline_error" in rec
    assert rec["value"] > 0  # stale RECORDED_HEADLINE value, not nothing
    assert not isinstance(rec["extra"]["vit_encode_frames_per_sec"], dict)


@pytest.mark.smoke
def test_driver_sigterm_mid_suite_emits_partial_record():
    """Kill the driver mid-suite the way the external `timeout` does and
    assert the stdout still ends with one valid JSON record."""
    proc = subprocess.Popen(
        [sys.executable, BENCH],
        env=_env(
            # first extra (decode_int8) hangs -> the driver sits inside
            # subprocess.run when the TERM arrives, after the headline
            # already completed live
            UFVIDEO_BENCH_FAKE_HANG="decode_int8",
            UFVIDEO_BENCH_DEADLINE="60",
        ),
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    time.sleep(4.0)  # headline (instant) done; decode_int8 hanging
    proc.send_signal(signal.SIGTERM)
    out, err = proc.communicate(timeout=30)
    rec = _last_json(out)
    assert rec["partial"] is True
    # headline finished before the kill -> live
    assert "stale" not in rec
    assert rec["metric"] == "qwen2_7b_decode_tokens_per_sec"
    # unfinished modes still present, stale — the record is complete
    assert isinstance(rec["extra"]["sam2_encode_frames_per_sec"], dict)


@pytest.mark.smoke
def test_driver_checkpoints_partial_file():
    subprocess.run(
        [sys.executable, BENCH], env=_env(), capture_output=True, text=True,
        timeout=120, check=True,
    )
    path = os.path.join(os.path.dirname(BENCH), "BENCH_PARTIAL.json")
    assert os.path.exists(path)
    with open(path) as f:
        rec = json.loads(f.read())
    assert rec["metric"] == "qwen2_7b_decode_tokens_per_sec"
