"""Sequential on-chip bench sweep with per-mode wall times -> JSONL log.

Runs each mode in a fresh subprocess (one mode's HBM residue can't OOM the
next; a single hung compile can't stall the whole sweep past its timeout).
"""
import json, subprocess, sys, time, os

MODES = sys.argv[1:] or [
    "decode_int8_kvq8",
    "decode_int8_spec_best",
    "decode_int8_spec_worst",
    "e2e_batch16",
    "decode_int8",
    "sam_encode",
]
LOG = os.environ.get("BENCH_LOG", "/root/repo/.bench_logs/seq.jsonl")

for mode in MODES:
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "bench.py", mode],
            capture_output=True, text=True,
            timeout=float(os.environ.get("BENCH_TIMEOUT", 2400)),
            cwd="/root/repo",
        )
        out = r.stdout.strip().splitlines()
        rec = {"mode": mode, "wall_s": round(time.time() - t0, 1),
               "rc": r.returncode,
               "line": out[-1] if out else "",
               "stderr_tail": r.stderr[-400:] if r.returncode else ""}
    except subprocess.TimeoutExpired:
        rec = {"mode": mode, "wall_s": round(time.time() - t0, 1),
               "rc": -1, "timeout": True}
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
