"""Device mesh construction, multi-host rendezvous, and sharding helpers.

The reference's distribution layer is torchrun DDP + DeepSpeed ZeRO over NCCL
(reference: scripts/zero2.json, scripts/train/train_1121v1.sh:106-111
``torchrun --nnodes W``, train.py via HF Trainer). The TPU-native equivalent
is :func:`maybe_initialize_distributed` (the torchrun-rendezvous counterpart)
plus a single `jax.sharding.Mesh` over the GLOBAL device set with named axes
and XLA collectives over ICI/DCN; this module owns axis conventions for the
whole framework:

  - ``data``:   pure data parallelism (batch sharding)
  - ``fsdp``:   ZeRO-equivalent parameter/optimizer sharding (batch is also
                sharded over this axis; params are all-gathered per layer)
  - ``tensor``: tensor parallelism inside attention/MLP blocks

Axis order is DCN-major: devices are laid out process-major and ``data`` is
the outermost mesh axis, so on a multi-host run the ``data`` axis crosses
host boundaries first (gradient all-reduce rides DCN, per-layer fsdp
all-gathers and tensor collectives stay on intra-host ICI). Launch with
``dp == number of hosts/slices`` to keep it that way.

Single-chip work uses a trivial 1x1x1 mesh so the same pjit'd code runs
everywhere.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"
PIPE_AXIS = "pipe"
AXIS_NAMES = (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS)
AXIS_NAMES_PP = (DATA_AXIS, PIPE_AXIS, FSDP_AXIS, TENSOR_AXIS)

# Batch dimension is sharded over both DP-style axes.
BATCH_SPEC = P((DATA_AXIS, FSDP_AXIS))


def maybe_initialize_distributed() -> bool:
    """Multi-host rendezvous — the counterpart of the reference's
    ``torchrun --nnodes W ... --master_addr`` + NCCL process group
    (train_1121v1.sh:106-111).

    Env-driven so every entry point (scripts/train.py, eval/run.py,
    __graft_entry__.py, serve) gets the same behavior:

      UFVIDEO_NUM_PROCESSES=W UFVIDEO_PROCESS_ID=i \\
      UFVIDEO_COORDINATOR=host:port   → explicit jax.distributed.initialize
      UFVIDEO_DIST_AUTO=1             → argless initialize (TPU pod / SLURM
                                        cluster autodetection)
      (neither set)                   → no-op, single-process

    Returns True when this process is part of a multi-process runtime
    (whether initialized here or already initialized). Safe to call more
    than once.
    """
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    n = os.environ.get("UFVIDEO_NUM_PROCESSES", "")
    if n:
        jax.distributed.initialize(
            coordinator_address=os.environ["UFVIDEO_COORDINATOR"],
            num_processes=int(n),
            process_id=int(os.environ["UFVIDEO_PROCESS_ID"]),
        )
        return jax.process_count() > 1
    if os.environ.get("UFVIDEO_DIST_AUTO", "") == "1":
        jax.distributed.initialize()
        return jax.process_count() > 1
    return False


def create_mesh(
    dp: int = 1,
    fsdp: int = -1,
    tp: int = 1,
    *,
    pp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, fsdp, tensor) mesh over the GLOBAL device set —
    or (data, pipe, fsdp, tensor) when ``pp > 1``.

    Any axis set to ``-1`` absorbs the remaining devices. The default
    (dp=1, fsdp=all, tp=1) is the ZeRO-equivalent layout matching the
    reference's DeepSpeed stage-1/2 training (scripts/zero1.json, zero2.json).
    ``pp``: pipeline stages (parallel/pipeline.py); kept inside ``data`` in
    the layout so stage-to-stage ppermutes ride ICI, never DCN.

    Devices are ordered process-major before the reshape, so the outermost
    ``data`` axis varies slowest across processes: on a multi-host run with
    dp == process count, ``data`` is exactly the cross-host (DCN) axis and
    pipe/fsdp/tensor collectives stay inside each host's ICI domain.
    """
    devices = list(devices if devices is not None else jax.devices())
    devices.sort(key=lambda d: (d.process_index, d.id))
    n = len(devices)
    axis_names = AXIS_NAMES_PP if pp != 1 else AXIS_NAMES
    sizes = [dp, pp, fsdp, tp] if pp != 1 else [dp, fsdp, tp]
    n_fixed = int(np.prod([s for s in sizes if s != -1]))
    n_auto = sizes.count(-1)
    if n_auto > 1:
        raise ValueError("at most one mesh axis may be -1")
    if n_auto == 1:
        if n % n_fixed != 0:
            raise ValueError(f"{n} devices not divisible by fixed axes {n_fixed}")
        sizes[sizes.index(-1)] = n // n_fixed
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh {sizes} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, axis_names)


def single_device_mesh(device: Optional[jax.Device] = None) -> Mesh:
    device = device or jax.devices()[0]
    return Mesh(np.asarray([device]).reshape(1, 1, 1), AXIS_NAMES)


def sharding(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, BATCH_SPEC)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


@contextlib.contextmanager
def maybe_mesh(mesh: Optional[Mesh]):
    """Enter the mesh context if one is given."""
    if mesh is None:
        yield
    else:
        with mesh:
            yield


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    dp = mesh.shape[DATA_AXIS] * mesh.shape[FSDP_AXIS]
    assert global_batch % dp == 0, (global_batch, dp)
    return global_batch // dp
