"""Test configuration.

- Runs the suite on CPU by default with 8 virtual devices so multi-chip
  sharding logic is exercised on a single host (the JAX analog of a fake
  distributed backend; SURVEY §4). Set UFVIDEO_TEST_TPU=1 to run the
  real-chip kernel tests instead (first compiles on a tunneled TPU are slow).
- Pallas kernels still get CPU coverage through interpret mode.
"""

import os
import sys

os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
RUN_TPU = os.environ.get("UFVIDEO_TEST_TPU", "") == "1"
if not RUN_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
if not RUN_TPU:
    # The axon sitecustomize imports jax and pins the TPU platform at
    # interpreter startup, so the env var alone is not enough — force the
    # platform through the live config.
    jax.config.update("jax_platforms", "cpu")
    # NOTE: do NOT enable the persistent compilation cache here. On this
    # CPU backend it needs jax_persistent_cache_enable_xla_caches="all" to
    # write anything, and that path segfaulted inside
    # _compile_and_write_cache mid-suite (reproduced 2026-08-18 on a SAM2
    # position-embedding compile). Warm-rerun speedups (~2.5x) are not
    # worth a crashing suite; revisit if the backend stabilizes.


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_programs():
    """Full-suite single-process runs segfaulted twice (2026-08-18) inside
    XLA's CPU ``backend_compile_and_load`` ~90% in, at different tests each
    time, with >120 GB RAM free — consistent with compiler-resource
    exhaustion after hundreds of live compiled programs, not OOM. Dropping
    every compiled executable at module teardown caps the live-program
    count; modules recompile their own shapes anyway, so cross-module reuse
    was minimal. CPU-only: on the real chip a recompile costs 3-25 min per
    variant, so clearing between modules would be ruinous there."""
    yield
    if not RUN_TPU:
        jax.clear_caches()


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture(scope="session")
def cpu_mesh():
    """8-way (1 data, 4 fsdp, 2 tensor) CPU mesh for sharding tests."""
    from ufvideo_tpu.parallel import create_mesh

    return create_mesh(dp=1, fsdp=4, tp=2, devices=jax.devices("cpu")[:8])


def has_tpu() -> bool:
    if not RUN_TPU:
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


requires_tpu = pytest.mark.skipif(
    not has_tpu(), reason="needs a TPU chip (set UFVIDEO_TEST_TPU=1)"
)


# ---- smoke tier (-m smoke): cheap-green subset, <2 min on a loaded host ----
SMOKE_FILES = {
    "test_conversation.py",
    "test_data_layouts.py",
    "test_rle.py",
    "test_eval_metrics.py",
    "test_parallel.py",
    "test_seg_loss_resolution.py",
    "test_splice.py",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if os.path.basename(str(item.fspath)) in SMOKE_FILES:
            item.add_marker(pytest.mark.smoke)
