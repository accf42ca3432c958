"""Pipeline parallelism over a scan-folded layer stack.

Beyond-reference capability (the reference is DP-only, SURVEY.md §2c): a
GPipe-style pipeline over a ``pipe`` mesh axis, built the TPU way — the
layer-stacked parameter pytree (leading axis L, exactly what ``nn.scan``
produces) is sharded over the pipe axis so each chip holds L/p contiguous
layers, microbatched activations flow stage-to-stage over ICI via
``lax.ppermute``, and the whole schedule is one ``lax.scan`` over
M + p - 1 ticks inside a single ``shard_map`` (no per-stage Python, no
host round-trips; XLA overlaps each tick's permute with the next tick's
layer compute).

Schedule (classic fill-drain pipeline):

    tick t: stage s processes microbatch (t - s); stage 0 injects
    microbatch t from the input buffer, stage p-1 retires microbatch
    t-(p-1) into the output buffer, then every stage's activation shifts
    one stage forward. Every stage runs its local layer scan every tick —
    bubble ticks compute garbage that the inject/retire masking discards
    (uniform per-tick programs keep the step fully static for XLA).

Differentiable end-to-end: ``ppermute`` transposes to the reverse
permutation, the retire/inject ``dynamic_*_in_dim`` pair transposes to
gather/scatter-add, and the final ``psum`` (which replicates the last
stage's outputs across the pipe axis) transposes to an identity slice —
so ``jax.grad`` through :func:`pipeline_apply` yields exactly the dense
stack's gradients, microbatch-accumulated. Memory follows GPipe: all M
microbatch activations are live across the tick scan; pass
``remat=True`` to recompute each stage's layer scan in the backward pass.

Usage sites: :func:`pipeline_backbone` runs the Qwen2 train-mode backbone
(``models/qwen2.py``) under a pipe×data mesh; ``__graft_entry__``'s
multichip dryrun exercises it against the dense scan.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _prepend_axis(spec: P, name: Optional[str]) -> P:
    return P(name, *spec)


def pipeline_apply(
    layer_fn: Callable[[Any, Any], Any],
    stacked_params: Any,
    carries: Any,
    mesh: Mesh,
    *,
    pipe_axis: str = "pipe",
    carry_spec: Optional[Any] = None,
    remat: bool = False,
    remat_policy: Any = "dots",
    out_select: Optional[Callable[[Any], Any]] = None,
) -> Any:
    """Run every microbatch carry through all L layers, pipelined.

    Args:
      layer_fn: ``(params_of_one_layer, carry) -> carry`` — pure single-layer
        application (e.g. a flax ``module.apply`` closure).
      stacked_params: pytree whose every leaf has leading axis L (the
        ``nn.scan`` layout). L must be divisible by ``mesh.shape[pipe_axis]``;
        each stage holds the contiguous slice of L/p layers shard_map gives it.
      carries: pytree of microbatched inputs — every leaf has leading axis M
        (number of microbatches). Per-microbatch shapes are what ``layer_fn``
        consumes.
      mesh: mesh containing ``pipe_axis`` (other axes compose: give
        ``carry_spec`` leaves that shard their dims over those axes, e.g.
        batch over a data axis).
      carry_spec: optional pytree of ``PartitionSpec`` for ONE microbatch
        (without the leading M axis), matching ``carries``' structure.
        Defaults to fully replicated.
      remat: recompute each stage's local layer scan in the backward pass.
        Requires the caller to be under ``jax.jit`` (eager ``closed_call``
        inside shard_map is unsupported) — which a train step always is.
      remat_policy: checkpoint policy for ``remat=True``. The default
        ``"dots"`` maps to ``checkpoint_dots_with_no_batch_dims`` — matmul
        results are saved and only elementwise work is recomputed, matching
        the dense scan's ``nn.remat`` policy (models/qwen2.py) so pp+remat
        costs the same MXU work as dense+remat. Pass ``None`` for full
        recompute or any ``jax.checkpoint_policies`` member.
      out_select: maps a carry pytree to the sub-pytree to retire into the
        output buffers (default: the whole carry). Loop-invariant carry
        legs (rope tables, seq_lens, ...) should be excluded — every
        retired leaf is buffered across all M microbatches and
        psum-replicated over the pipe axis at the end, so retiring a leg
        nobody reads wastes output HBM and ICI bandwidth.

    Returns:
      ``out_select`` of a pytree like ``carries`` — each microbatch after
      all L layers, replicated over the pipe axis.
    """
    p = mesh.shape[pipe_axis]
    num_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    if num_layers % p != 0:
        raise ValueError(f"{num_layers} layers not divisible by pipe={p}")
    m = jax.tree.leaves(carries)[0].shape[0]

    if carry_spec is None:
        carry_spec = jax.tree.map(lambda _: P(), carries)
    if out_select is None:
        out_select = lambda c: c
    in_carry_specs = jax.tree.map(
        lambda s: _prepend_axis(s, None), carry_spec,
        is_leaf=lambda x: isinstance(x, P),
    )
    out_specs = out_select(in_carry_specs)
    param_specs = jax.tree.map(lambda _: P(pipe_axis), stacked_params)

    def run_local_layers(local_params, carry):
        def body(c, pl):
            return layer_fn(pl, c), None

        return jax.lax.scan(body, carry, local_params)[0]

    if remat:
        policy = (
            jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims
            if remat_policy == "dots"
            else remat_policy
        )
        run_local_layers = jax.checkpoint(run_local_layers, policy=policy)

    def stage_fn(local_params, carries):
        stage = jax.lax.axis_index(pipe_axis)
        fwd = [(i, (i + 1) % p) for i in range(p)]
        h0 = jax.tree.map(
            lambda a: jnp.zeros(a.shape[1:], a.dtype), carries
        )
        outs0 = jax.tree.map(jnp.zeros_like, out_select(carries))

        def tick(state, t):
            h, outs = state
            # stage 0 injects microbatch t (clamped past the drain ticks;
            # the clamped re-reads feed only bubble compute)
            mb_idx = jnp.clip(t, 0, m - 1)
            h = jax.tree.map(
                lambda buf, cur: jnp.where(
                    stage == 0,
                    jax.lax.dynamic_index_in_dim(buf, mb_idx, 0, False),
                    cur,
                ),
                carries,
                h,
            )
            h = run_local_layers(local_params, h)
            # stage p-1 retires microbatch t-(p-1)
            out_idx = jnp.clip(t - (p - 1), 0, m - 1)
            write = jnp.logical_and(t >= p - 1, stage == p - 1)
            outs = jax.tree.map(
                lambda o, v: jax.lax.dynamic_update_index_in_dim(
                    o,
                    jnp.where(
                        write,
                        v,
                        jax.lax.dynamic_index_in_dim(o, out_idx, 0, False),
                    ),
                    out_idx,
                    0,
                ),
                outs,
                out_select(h),
            )
            h = jax.tree.map(
                lambda a: jax.lax.ppermute(a, pipe_axis, fwd), h
            )
            return (h, outs), None

        (_, outs), _ = jax.lax.scan(
            tick, (h0, outs0), jnp.arange(m + p - 1)
        )
        # only stage p-1 holds real outputs (others all-zero) — psum
        # replicates them across the pipe axis
        return jax.tree.map(
            lambda a: jax.lax.psum(a, pipe_axis), outs
        )

    # check_vma=False: the inject/retire jnp.where branches mix
    # stage-varying (axis_index) and replicated operands, which VMA-typed
    # shard_map rejects even though the psum at the end re-establishes
    # replication. With tracking off, the correctness of the psum's
    # TRANSPOSE under jax.grad (exact microbatch-accumulated gradients —
    # this module's central claim) is guaranteed only by
    # tests/test_pipeline.py's grad-parity tests; re-run them as the canary
    # on any JAX upgrade.
    return jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(param_specs, in_carry_specs),
        out_specs=out_specs,
        check_vma=False,
    )(stacked_params, carries)


def pipeline_backbone(
    cfg,
    params: Any,
    input_embeds: jnp.ndarray,  # [B, S, hidden]
    positions: jnp.ndarray,  # [B, S] int32
    seq_lens: Optional[jnp.ndarray],  # [B] or None
    mesh: Mesh,
    *,
    pipe_axis: str = "pipe",
    num_microbatches: int,
    data_axis: Optional[str] = None,
    dtype: Any = jnp.bfloat16,
    param_dtype: Any = jnp.bfloat16,
    remat: bool = False,
) -> jnp.ndarray:
    """Qwen2 train-mode backbone, pipelined over ``mesh[pipe_axis]``.

    ``params`` is the Qwen2LM param tree (needs ``layers`` + ``norm``).
    The batch dim is split into ``num_microbatches`` microbatches (B % M
    == 0); per-microbatch rows may additionally shard over ``data_axis``.
    Returns final hidden states [B, S, hidden] after the output RMSNorm —
    the pipelined equivalent of ``Qwen2LM.backbone(..., mode='train')[0]``.
    """
    from ..models.qwen2 import Qwen2DecoderLayer, RMSNorm
    from ..ops.rope import rope_cos_sin

    b, s, _ = input_embeds.shape
    m = num_microbatches
    if b % m != 0:
        raise ValueError(f"batch {b} not divisible by microbatches {m}")
    if seq_lens is None:
        seq_lens = jnp.full((b,), s, jnp.int32)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    cache_len = jnp.zeros((b,), jnp.int32)

    to_mb = lambda a: a.reshape((m, b // m) + a.shape[1:])
    carries = (
        to_mb(input_embeds.astype(dtype)),
        to_mb(cos),
        to_mb(sin),
        to_mb(seq_lens),
        to_mb(cache_len),
    )
    row = P(data_axis)
    carry_spec = (
        P(data_axis, None, None),
        P(data_axis, None, None),
        P(data_axis, None, None),
        row,
        row,
    )

    layer = Qwen2DecoderLayer(cfg, dtype, param_dtype)

    def layer_fn(layer_params, carry):
        return layer.apply({"params": layer_params}, carry, None, None, "train")[0]

    out = pipeline_apply(
        layer_fn,
        params["layers"],
        carries,
        mesh,
        pipe_axis=pipe_axis,
        carry_spec=carry_spec,
        remat=remat,
        # only the hidden states leave the pipeline; rope tables/seq_lens
        # are loop-invariant and nobody reads them back
        out_select=lambda c: c[0],
    )
    x = out.reshape(b, s, -1)
    norm = RMSNorm(cfg.rms_norm_eps, dtype, param_dtype)
    return norm.apply({"params": params["norm"]}, x)
