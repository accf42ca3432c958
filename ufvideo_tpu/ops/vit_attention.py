"""Pallas full-sequence multi-head attention for ViT towers (SigLIP).

SigLIP-SO400M attends over 729 tokens with 16 heads of dim 72. The generic
flash kernel runs one (batch, head) pair per grid step with d padded to 128
— 1024 tiny grid steps per layer, pipeline-latency bound (measured 6.8 ms
per layer call at [64, 729, 16, 72]; PERF.md). This kernel instead takes
q/k/v in their UNSPLIT [B, S, H*D] projection layout (H*D = 1152 = 9 lane
tiles — aligned, no HBM head-split or padded relayout), runs one image per
grid step, and loops heads in VMEM where the 72-lane head slices cost
vector shuffles instead of HBM traffic.

Forward-only; VJP recomputes through the XLA reference (the vision tower is
frozen in reference training, train.py:861-916). Reference behavior:
torch SDPA in SiglipAttention (HF modeling_siglip.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads, head_dim, scale, bb):
    q = q_ref[:].reshape(bb * q_ref.shape[1], num_heads * head_dim)
    k = k_ref[:].reshape(q.shape)
    v = v_ref[:].reshape(q.shape)
    s_tokens = q_ref.shape[1]
    if bb > 1:
        rows = bb * s_tokens
        img_r = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // s_tokens
        img_c = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // s_tokens
        same = img_r == img_c
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if bb > 1:
            s = jnp.where(same, s, float(jnp.finfo(jnp.float32).min))
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(q.dtype), v[:, sl],
                    preferred_element_type=jnp.float32)
        o_ref[:, :, sl] = o.astype(o_ref.dtype).reshape(bb, s_tokens, head_dim)


def _reference(q, k, v, num_heads, scale):
    b, s, hd = q.shape
    d = hd // num_heads
    qh = q.reshape(b, s, num_heads, d)
    kh = k.reshape(b, s, num_heads, d)
    vh = v.reshape(b, s, num_heads, d)
    logits = (
        jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) * scale
    )
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), vh)
    return o.reshape(b, s, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def mha_full_attention(
    q: jnp.ndarray,  # [B, S, H*D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    head_dim: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Unmasked full attention, inputs/outputs in projection layout."""
    return _forward(q, k, v, num_heads, head_dim, interpret)


def _forward(q, k, v, num_heads, head_dim, interpret):
    b, s, hd = q.shape
    assert hd == num_heads * head_dim, (hd, num_heads, head_dim)
    scale = head_dim ** -0.5
    if not interpret and jax.default_backend() != "tpu":
        return _reference(q, k, v, num_heads, scale)
    # images per grid step: keep qkv blocks + [rows, rows] scores within a
    # conservative VMEM budget
    bb = 1
    while (
        b % (bb * 2) == 0
        and (bb * 2 * s) * hd * 2 * 8 + (bb * 2 * s) ** 2 * 4 < 10 * 2 ** 20
    ):
        bb *= 2
    kernel = functools.partial(
        _kernel, num_heads=num_heads, head_dim=head_dim, scale=scale, bb=bb,
    )
    spec = pl.BlockSpec((bb, s, hd), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, s, hd), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _fwd(q, k, v, num_heads, head_dim, interpret):
    return _forward(q, k, v, num_heads, head_dim, interpret), (q, k, v)


def _bwd(num_heads, head_dim, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda a, b_, c: _reference(a, b_, c, num_heads, head_dim ** -0.5),
        q, k, v,
    )
    return vjp(g)


mha_full_attention.defvjp(_fwd, _bwd)
