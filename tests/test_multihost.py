"""Multi-host runtime: 2-process × 4-CPU-device distributed FSDP training.

The reference trains across nodes via torchrun + NCCL
(reference: scripts/train/train_1121v1.sh:106-111); the TPU-native
counterpart is env-driven jax.distributed + a global mesh. This test proves
the whole chain cross-PROCESS (not just cross-device): two OS processes
rendezvous through maybe_initialize_distributed, build one global
(data=2, fsdp=2, tensor=2) mesh, each feeds its local half of the global
batch, and two optimizer steps produce exactly the single-process losses.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_child.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_children(n_procs: int, timeout: float = 600.0):
    port = _free_port()
    procs = []
    for pid in range(n_procs):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={8 // n_procs}"
        )
        if n_procs > 1:
            env["UFVIDEO_NUM_PROCESSES"] = str(n_procs)
            env["UFVIDEO_PROCESS_ID"] = str(pid)
            env["UFVIDEO_COORDINATOR"] = f"127.0.0.1:{port}"
        procs.append(
            subprocess.Popen(
                [sys.executable, CHILD],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    results = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"child rc={p.returncode}:\n{err[-3000:]}"
        m = re.search(
            r"RESULT pid=(\d+) distributed=(\w+) loss=([\d.]+) "
            r"loss2=([\d.]+) gnorm=([\d.]+)",
            out,
        )
        assert m, f"no RESULT line in: {out!r}\n{err[-2000:]}"
        results.append(
            {
                "pid": int(m.group(1)),
                "distributed": m.group(2) == "True",
                "loss": float(m.group(3)),
                "loss2": float(m.group(4)),
                "gnorm": float(m.group(5)),
            }
        )
    return results


def test_two_process_fsdp_step_matches_single_process():
    (ref,) = _run_children(1)
    assert not ref["distributed"]
    two = _run_children(2)
    assert all(r["distributed"] for r in two)
    # both processes observe the same global loss...
    assert two[0]["loss"] == two[1]["loss"]
    assert two[0]["loss2"] == two[1]["loss2"]
    # ...and it is the single-process loss: same global batch, same math,
    # only the process boundary differs (fp32 CPU, highest precision; tiny
    # tolerance for cross-device reduction order)
    for key in ("loss", "loss2", "gnorm"):
        assert abs(two[0][key] - ref[key]) <= 2e-5 * max(abs(ref[key]), 1.0), (
            key, two[0][key], ref[key],
        )
