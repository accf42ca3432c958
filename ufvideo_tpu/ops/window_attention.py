"""Pallas fused windowed attention for SAM2's Hiera trunk.

The trunk's windowed stages run attention over thousands of tiny windows
(16-256 tokens) with head_dim 72. Splitting heads in XLA materializes
[B*nW, S, H, d] tensors whose minor dims (H≤16, d=72) are far off the TPU's
(16, 128) tile — the forced padded relayouts cost ~2x the whole encoder
(measured; PERF.md). This kernel consumes the qkv projection in its natural
fused-lane layout [NW, S, 3*H*hp] (hp = lanes per head, 128-aligned via the
converter's head padding) and does ALL head handling in VMEM: lane slices at
128-multiples, per-head softmax(q kᵀ)v as plain 2D MXU matmuls, several
windows per grid step batched through a block-diagonal score mask.

Forward-only Pallas; the VJP recomputes through an XLA reference (the trunk
is frozen during reference-style training, so the backward is a rarely-hit
fallback). Reference behavior: sam2.py:1000-1046 MultiScaleAttention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _kernel(qkv_ref, o_ref, *, num_heads, head_pad, tokens, scale, bw, gw):
    # Windows are processed in row GROUPS of gw windows (gw*tokens rows,
    # chosen ~128-256): the block-diagonal score matmul wastes gw x the real
    # FLOPs, so small groups keep the waste bounded, while looping several
    # groups (and heads) inside one grid step keeps the grid coarse enough
    # that step pipeline latency never dominates. (Round-1 used one
    # 512-row group per step: 4-32x score-FLOP waste on 16-64-token
    # windows — measured as the dominant Hiera stage-1/2 cost.)
    rows = gw * tokens
    log2e = 1.4426950408889634
    if gw > 1:
        win_r = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // tokens
        win_c = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // tokens
        same = win_r == win_c
    for g in range(bw // gw):
        x = qkv_ref[g * gw : (g + 1) * gw].reshape(
            rows, 3 * num_heads * head_pad
        )
        for h in range(num_heads):
            q = (
                x[:, h * head_pad : (h + 1) * head_pad].astype(jnp.float32)
                * (scale * log2e)
            ).astype(x.dtype)
            k = x[:, (num_heads + h) * head_pad : (num_heads + h + 1) * head_pad]
            v = x[
                :, (2 * num_heads + h) * head_pad : (2 * num_heads + h + 1) * head_pad
            ]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if gw > 1:
                s = jnp.where(same, s, _NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            # exp2 at the input dtype (bf16 in the model: 2x VPU rate; the
            # pv matmul consumed bf16 probs anyway, only the f32-accumulated
            # denominator sees the rounding)
            p = jnp.exp2((s - m).astype(x.dtype))
            denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            o = jnp.dot(
                p, v, preferred_element_type=jnp.float32
            ) / denom
            # store per head — no concat list holding all heads live in VMEM
            o_ref[
                g * gw : (g + 1) * gw, :, h * head_pad : (h + 1) * head_pad
            ] = o.astype(o_ref.dtype).reshape(gw, tokens, head_pad)


def _reference(qkv, num_heads, head_pad, scale):
    """Same math in XLA (used off-TPU and as the VJP recompute path)."""
    nw, s, _ = qkv.shape
    x = qkv.reshape(nw, s, 3, num_heads, head_pad)
    q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]
    logits = (
        jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(qkv.dtype), v)
    return o.reshape(nw, s, num_heads * head_pad)


def _pick_bw(num_windows: int, tokens: int, lanes: int, num_heads: int):
    """Pick (bw, gw): gw windows per masked score group (~128 rows — bounds
    the block-diagonal FLOP waste), bw windows per grid step (~1024 rows —
    amortizes grid pipeline latency), within VMEM and unroll budgets."""
    gw = max(1, 128 // tokens)
    while num_windows % gw != 0:  # degenerate window counts
        gw //= 2
    group_rows = gw * tokens

    def vmem_bytes(b):
        rows = b * tokens
        blocks = 2 * rows * (lanes + lanes // 3) * 2  # qkv+out, 2x buffered
        return blocks + 3 * group_rows * group_rows * 4

    bw = gw
    while (
        bw * 2 * tokens <= 4096
        and num_windows % (bw * 2) == 0
        and (bw * 2 // gw) * num_heads <= 64  # unrolled dots per step
        and vmem_bytes(bw * 2) < 24 * 2 ** 20
    ):
        bw *= 2
    return bw, gw


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4)
)
def fused_window_attention(
    qkv: jnp.ndarray,  # [NW, S, 3*H*hp], lanes ordered [q heads|k heads|v heads]
    num_heads: int,
    head_dim: int,  # REAL head dim (softmax scale); pads are zero
    head_pad: int,  # lanes per head, multiple of 128
    interpret: bool = False,
) -> jnp.ndarray:  # [NW, S, H*hp]
    return _forward(qkv, num_heads, head_dim, head_pad, interpret)


def _forward(qkv, num_heads, head_dim, head_pad, interpret):
    nw, s, c = qkv.shape
    assert c == 3 * num_heads * head_pad, (c, num_heads, head_pad)
    scale = head_dim ** -0.5
    if not interpret and jax.default_backend() != "tpu":
        return _reference(qkv, num_heads, head_pad, scale)
    bw, gw = _pick_bw(nw, s, c, num_heads)
    kernel = functools.partial(
        _kernel, num_heads=num_heads, head_pad=head_pad, tokens=s,
        scale=scale, bw=bw, gw=gw,
    )
    return pl.pallas_call(
        kernel,
        grid=(nw // bw,),
        in_specs=[pl.BlockSpec((bw, s, c), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec(
            (bw, s, num_heads * head_pad), lambda i: (i, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nw, s, num_heads * head_pad), qkv.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20
        ),
        interpret=interpret,
    )(qkv)


def _fwd(qkv, num_heads, head_dim, head_pad, interpret):
    return _forward(qkv, num_heads, head_dim, head_pad, interpret), qkv


def _bwd(num_heads, head_dim, head_pad, interpret, qkv, g):
    _, vjp = jax.vjp(
        lambda x: _reference(x, num_heads, head_pad, head_dim ** -0.5), qkv
    )
    return vjp(g)


fused_window_attention.defvjp(_fwd, _bwd)
