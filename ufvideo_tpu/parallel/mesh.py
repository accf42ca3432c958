"""Device mesh construction and sharding helpers.

The reference's distribution layer is torchrun DDP + DeepSpeed ZeRO over NCCL
(reference: scripts/zero2.json, train.py via HF Trainer). The TPU-native
equivalent is a single `jax.sharding.Mesh` with named axes and XLA collectives
over ICI; this module owns axis conventions for the whole framework:

  - ``data``:   pure data parallelism (batch sharding)
  - ``fsdp``:   ZeRO-equivalent parameter/optimizer sharding (batch is also
                sharded over this axis; params are all-gathered per layer)
  - ``tensor``: tensor parallelism inside attention/MLP blocks

Single-chip work uses a trivial 1x1x1 mesh so the same pjit'd code runs
everywhere.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"
AXIS_NAMES = (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS)

# Batch dimension is sharded over both DP-style axes.
BATCH_SPEC = P((DATA_AXIS, FSDP_AXIS))


def create_mesh(
    dp: int = 1,
    fsdp: int = -1,
    tp: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, fsdp, tensor) mesh.

    Any axis set to ``-1`` absorbs the remaining devices. The default
    (dp=1, fsdp=all, tp=1) is the ZeRO-equivalent layout matching the
    reference's DeepSpeed stage-1/2 training (scripts/zero1.json, zero2.json).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sizes = [dp, fsdp, tp]
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
    return Mesh(dev_array, AXIS_NAMES)


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
