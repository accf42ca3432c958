"""Parameter sharding rules: param-path regex -> PartitionSpec.

The reference has no model sharding at all (SURVEY §2c: DP only). Here we
define TPU-native rules so the 7B LLM can run tensor-parallel over ICI and
everything can be FSDP-sharded (ZeRO-equivalent). Rules are matched on the
'/'-joined param path of the flax param pytree; first match wins.
"""

from __future__ import annotations

import math
import re
import warnings
from typing import Any, Dict, List, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import FSDP_AXIS, TENSOR_AXIS

Rules = Sequence[Tuple[str, P]]

# Qwen2 LLM tensor-parallel layout: attention q/k/v and mlp gate/up are
# column-parallel (output dim over 'tensor'), o_proj and mlp down are
# row-parallel (input dim over 'tensor'); embeddings/lm_head over vocab.
# FSDP shards the other large dim.
QWEN2_RULES: Rules = (
    (r".*embed_tokens/embedding$", P(TENSOR_AXIS, FSDP_AXIS)),
    (r".*(q_proj|k_proj|v_proj|qkv_proj)/kernel$", P(FSDP_AXIS, TENSOR_AXIS)),
    (r".*(q_proj|k_proj|v_proj|qkv_proj)/bias$", P(TENSOR_AXIS)),
    (r".*o_proj/kernel$", P(TENSOR_AXIS, FSDP_AXIS)),
    (r".*(gate_proj|up_proj)/kernel$", P(FSDP_AXIS, TENSOR_AXIS)),
    (r".*down_proj/kernel$", P(TENSOR_AXIS, FSDP_AXIS)),
    (r".*lm_head/kernel$", P(FSDP_AXIS, TENSOR_AXIS)),
    (r".*norm.*/scale$", P()),
)

# Vision tower / projector / SAM2: FSDP-shard big matmuls, replicate the rest.
VISION_RULES: Rules = (
    (r".*(patch_embed|pos_emb).*", P()),
    (r".*kernel$", P(FSDP_AXIS)),
    (r".*", P()),
)

DEFAULT_RULES: Rules = QWEN2_RULES + VISION_RULES  # VISION_RULES ends in a catch-all


class LeadingSpec(P):
    """PartitionSpec that left-aligns against the param's dims instead of
    the default right-align — used to shard the scan-stacked LAYER axis
    (dim 0 of every ``llm/layers`` leaf) over a pipeline-stage mesh axis."""


def pipeline_rules(pipe_axis: str = "pipe", rules: Rules = DEFAULT_RULES) -> Rules:
    """Rules for pipeline-parallel training: every scan-stacked LLM layer
    param shards its leading layer axis over ``pipe_axis`` — the exact
    layout ``parallel.pipeline.pipeline_apply``'s shard_map consumes, so
    no per-step resharding of the 7B layer stack happens. Non-layer params
    (embeddings, lm_head, norms, towers) keep the base rules."""
    return ((r".*llm/layers/.*", LeadingSpec(pipe_axis)),) + tuple(rules)


def _spec_for(path: str, rules: Rules, ndim: int) -> P:
    for pattern, spec in rules:
        if re.fullmatch(pattern, path):
            parts = tuple(spec)
            if not parts or len(parts) > ndim:
                # replicated rule, or rule wider than the param → replicate
                return P()
            if isinstance(spec, LeadingSpec):
                return P(*(parts + (None,) * (ndim - len(parts))))
            # right-align: scan-stacked params carry a leading layer axis
            # ([L, in, out]) that must stay unsharded
            return P(*((None,) * (ndim - len(parts)) + parts))
    return P()


def _path_str(path) -> str:
    keys = []
    for p in path:
        if hasattr(p, "key"):
            keys.append(str(p.key))
        elif hasattr(p, "idx"):
            keys.append(str(p.idx))
        else:
            keys.append(str(p))
    return "/".join(keys)


def partition_specs(params: Any, rules: Rules = DEFAULT_RULES) -> Any:
    """PartitionSpec pytree mirroring ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(_path_str(path), rules, getattr(leaf, "ndim", 0)),
        params,
    )


def _divisible(shape: Tuple[int, ...], spec: P, mesh: Mesh) -> bool:
    for dim, axes in zip(shape, tuple(spec)):
        if axes is None:
            continue
        axes = (axes,) if isinstance(axes, str) else axes
        size = 1
        for a in axes:
            size *= mesh.shape[a]
        if dim % size != 0:
            return False
    return True


def shardings_for(params: Any, mesh: Mesh, rules: Rules = DEFAULT_RULES) -> Any:
    """NamedSharding pytree for ``params``; falls back to replication when a
    dim does not divide the mesh axis (small adapters, odd head counts).

    The fallback is never silent for big tensors: any leaf ≥100 MB whose
    requested spec fell back raises a warning (a replicated 7B-scale param
    on a real mesh is a deployment bug, not a convenience). Use
    :func:`audit_shardings` for a programmatic report."""
    specs = partition_specs(params, rules)

    def to_sharding(leaf, spec):
        shape = getattr(leaf, "shape", ())
        if not _divisible(shape, spec, mesh):
            nbytes = _leaf_nbytes(leaf)
            if nbytes >= AUDIT_MIN_BYTES and _shard_factor(spec, mesh) > 1:
                warnings.warn(
                    f"partition rule {spec} for a {shape} param "
                    f"({nbytes / 2**20:.0f} MB) does not divide mesh "
                    f"{dict(mesh.shape)} — falling back to replication",
                    stacklevel=3,
                )
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree.map(to_sharding, params, specs)


AUDIT_MIN_BYTES = 100 * 2**20  # flag fully-replicated params above this


def _leaf_nbytes(leaf) -> int:
    shape = getattr(leaf, "shape", ())
    dtype = getattr(leaf, "dtype", None)
    itemsize = getattr(dtype, "itemsize", None)
    if itemsize is None:
        itemsize = jax.numpy.dtype(dtype).itemsize if dtype is not None else 4
    return int(math.prod(shape)) * int(itemsize)


def _shard_factor(spec: P, mesh: Mesh) -> int:
    """Number of distinct shards the spec splits a tensor into on ``mesh``."""
    factor = 1
    for axes in tuple(spec):
        if axes is None:
            continue
        for a in (axes,) if isinstance(axes, str) else axes:
            factor *= mesh.shape[a]
    return factor


def audit_shardings(
    params: Any,
    mesh: Mesh,
    rules: Rules = DEFAULT_RULES,
    *,
    min_bytes: int = AUDIT_MIN_BYTES,
) -> List[Dict[str, Any]]:
    """Report every param ≥``min_bytes`` that ends up fully replicated on
    ``mesh`` — either its rule requested replication, or the requested spec
    did not divide the mesh and :func:`shardings_for` fell back.

    Returns a list of dicts with ``path / shape / mbytes / requested /
    reason``. An empty list is the at-scale deployment invariant the
    flagship dryrun asserts (no >100 MB tensor silently costs full HBM on
    every chip). ``params`` may be real arrays or ``jax.ShapeDtypeStruct``s.
    """
    specs = partition_specs(params, rules)
    findings: List[Dict[str, Any]] = []

    def visit(path, leaf, spec):
        nbytes = _leaf_nbytes(leaf)
        if nbytes < min_bytes:
            return
        shape = tuple(getattr(leaf, "shape", ()))
        divisible = _divisible(shape, spec, mesh)
        effective = spec if divisible else P()
        if _shard_factor(effective, mesh) > 1:
            return
        reason = (
            "divisibility fallback" if not divisible and _shard_factor(spec, mesh) > 1
            else "rule requested replication"
        )
        findings.append({
            "path": _path_str(path),
            "shape": shape,
            "mbytes": round(nbytes / 2**20, 1),
            "requested": str(spec),
            "reason": reason,
        })

    jax.tree_util.tree_map_with_path(visit, params, specs)
    return findings


def per_chip_state_bytes(
    params: Any, mesh: Mesh, rules: Rules = DEFAULT_RULES
) -> int:
    """Bytes of ``params`` (or a whole TrainState) resident per chip under
    the rule-derived shardings — the number the SCALING.md deployment table
    is checked against."""
    specs = partition_specs(params, rules)
    total = 0

    def visit(leaf, spec):
        nonlocal total
        shape = tuple(getattr(leaf, "shape", ()))
        effective = spec if _divisible(shape, spec, mesh) else P()
        total += _leaf_nbytes(leaf) // _shard_factor(effective, mesh)

    jax.tree.map(visit, params, specs)
    return total


def shard_params(params: Any, mesh: Mesh, rules: Rules = DEFAULT_RULES) -> Any:
    """Device-put ``params`` with the rule-derived shardings."""
    shardings = shardings_for(params, mesh, rules)
    return jax.tree.map(jax.device_put, params, shardings)
