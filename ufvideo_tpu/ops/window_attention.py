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

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _kernel(qkv_ref, o_ref, *, num_heads, head_pad, tokens, scale, bw):
    rows = bw * tokens
    x = qkv_ref[:].reshape(rows, 3 * num_heads * head_pad)
    # block-diagonal mask: rows/cols from different windows never attend
    win_r = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // tokens
    win_c = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // tokens
    same = win_r == win_c
    for h in range(num_heads):
        q = x[:, h * head_pad : (h + 1) * head_pad]
        k = x[:, (num_heads + h) * head_pad : (num_heads + h + 1) * head_pad]
        v = x[:, (2 * num_heads + h) * head_pad : (2 * num_heads + h + 1) * head_pad]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(same, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(x.dtype), v, preferred_element_type=jnp.float32)
        # store per head — no concat list holding all heads live in VMEM
        o_ref[:, :, h * head_pad : (h + 1) * head_pad] = (
            o.astype(o_ref.dtype).reshape(bw, tokens, head_pad)
        )


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


def _pick_bw(num_windows: int, tokens: int, lanes: int) -> int:
    """Windows per grid step: ~512 rows per score matrix, capped so the
    double-buffered qkv+out blocks + the score matrix stay well under the
    ~16 MB VMEM budget."""
    target = max(1, 512 // tokens)
    bw = 1

    def vmem_bytes(b):
        rows = b * tokens
        blocks = 2 * rows * (lanes + lanes // 3) * 2  # qkv+out, 2x buffered
        return blocks + rows * rows * 4

    while (
        bw * 2 <= target
        and num_windows % (bw * 2) == 0
        and vmem_bytes(bw * 2) < 10 * 2 ** 20
    ):
        bw *= 2
    return bw


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
    bw = _pick_bw(nw, s, c)
    kernel = functools.partial(
        _kernel, num_heads=num_heads, head_pad=head_pad, tokens=s,
        scale=scale, bw=bw,
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
