"""Pallas ragged decode attention: one query token vs a padded KV cache.

The serving-grade replacement for the reference's flash-attn decode path
(reference: train.py:973 flash_attention_2 inside HF generate). One grid
step per (batch, kv_head): the query's G grouped heads attend to that head's
full cache row with per-sequence length masking — no [B, H, S] logits in
HBM, no repeated KV for GQA, fp32 softmax in VMEM.

Layouts: q [B, Hkv, G, D]; cache [B, Hkv, S, D] (S multiple of 128).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(
    lens_ref,  # [B] int32 (SMEM, scalar prefetch)
    q_ref,  # [1, 1, Gp, D]
    k_ref,  # [1, 1, S, D]
    v_ref,  # [1, 1, S, D]
    o_ref,  # [1, 1, Gp, D]
    *,
    scale: float,
):
    b = pl.program_id(0)
    q = q_ref[0, 0]  # [Gp, D]
    k = k_ref[0, 0]  # [S, D]
    v = v_ref[0, 0]

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) * scale  # [Gp, S]

    length = lens_ref[b]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < length, s, _NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    p = (p / denom).astype(v.dtype)

    o_ref[0, 0] = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ).astype(o_ref.dtype)


def _kernel_q8(
    lens_ref,  # [B] int32 (SMEM, scalar prefetch)
    q_ref,  # [1, 1, Gp, D]
    k_ref,  # [1, 1, S, D] int8
    v_ref,  # [1, 1, S, D] int8
    ks_ref,  # [1, 1, 1, S] f32 per-position k scales
    vs_ref,  # [1, 1, 1, S] f32 per-position v scales
    o_ref,  # [1, 1, Gp, D]
    *,
    scale: float,
):
    """int8-KV variant: scores/probs are rescaled by the per-position
    quantization scales (they commute past the contraction over D exactly —
    scale is constant along the contracted axis), so the cache is read from
    HBM at half the bf16 traffic with no dequantized copy materialized."""
    b = pl.program_id(0)
    q = q_ref[0, 0]  # [Gp, D] bf16
    k = k_ref[0, 0].astype(q.dtype)  # int8 -> compute dtype, in VMEM
    v = v_ref[0, 0].astype(q.dtype)

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) * scale  # [Gp, S]
    s = s * ks_ref[0, 0]  # [1, S] k dequant, broadcast over rows

    length = lens_ref[b]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < length, s, _NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    p = ((p / denom) * vs_ref[0, 0]).astype(v.dtype)  # fold v dequant in

    o_ref[0, 0] = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def ragged_decode_attention_q8(
    q: jnp.ndarray,  # [B, Hkv, G, D] bf16
    k_cache: jnp.ndarray,  # [B, Hkv, S, D] int8
    v_cache: jnp.ndarray,  # [B, Hkv, S, D] int8
    k_scale: jnp.ndarray,  # [B, Hkv, S] f32
    v_scale: jnp.ndarray,  # [B, Hkv, S] f32
    lens: jnp.ndarray,  # [B] valid cache lengths
    *,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hkv, g, d = q.shape
    s = k_cache.shape[2]
    scale_val = float(d ** -0.5) if scale is None else float(scale)

    g_pad = _round_up(g, 8)
    d_pad = _round_up(d, 128)
    s_pad = _round_up(s, 128)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, g_pad - g), (0, d_pad - d)))
    kp = jnp.pad(k_cache, ((0, 0), (0, 0), (0, s_pad - s), (0, d_pad - d)))
    vp = jnp.pad(v_cache, ((0, 0), (0, 0), (0, s_pad - s), (0, d_pad - d)))
    ksp = jnp.pad(k_scale, ((0, 0), (0, 0), (0, s_pad - s)))[:, :, None, :]
    vsp = jnp.pad(v_scale, ((0, 0), (0, 0), (0, s_pad - s)))[:, :, None, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, g_pad, d_pad), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, d_pad), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, d_pad), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, s_pad), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, s_pad), lambda b, h, *_: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, g_pad, d_pad), lambda b, h, *_: (b, h, 0, 0)
        ),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_q8, scale=scale_val),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g_pad, d_pad), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(lens.astype(jnp.int32), qp, kp, vp, ksp, vsp)
    return out[:, :, :g, :d]


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def ragged_decode_attention(
    q: jnp.ndarray,  # [B, Hkv, G, D]
    k_cache: jnp.ndarray,  # [B, Hkv, S, D]
    v_cache: jnp.ndarray,
    lens: jnp.ndarray,  # [B] valid cache lengths
    *,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hkv, g, d = q.shape
    s = k_cache.shape[2]
    scale_val = float(d ** -0.5) if scale is None else float(scale)

    g_pad = _round_up(g, 8)
    d_pad = _round_up(d, 128)
    s_pad = _round_up(s, 128)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, g_pad - g), (0, d_pad - d)))
    kp = jnp.pad(k_cache, ((0, 0), (0, 0), (0, s_pad - s), (0, d_pad - d)))
    vp = jnp.pad(v_cache, ((0, 0), (0, 0), (0, s_pad - s), (0, d_pad - d)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, g_pad, d_pad), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, d_pad), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, d_pad), lambda b, h, *_: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, g_pad, d_pad), lambda b, h, *_: (b, h, 0, 0)
        ),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale_val),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g_pad, d_pad), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(lens.astype(jnp.int32), qp, kp, vp)
    return out[:, :, :g, :d]
