"""Pallas full-sequence multi-head attention for ViT towers (SigLIP).

SigLIP-SO400M attends over 729 tokens with 16 heads of dim 72. The generic
flash kernel runs one (batch, head) pair per grid step with d padded to 128
— 1024 tiny grid steps per layer, pipeline-latency bound (measured 6.8 ms
per layer call at [64, 729, 16, 72]; PERF.md). This kernel instead takes
q/k/v PACKED in one [B, S, 3*H*D] projection buffer (the output of a single
fused qkv matmul — 3456 = 27 lane tiles, aligned), runs ``bb`` images per
grid step, and slices head/q-k-v lanes in VMEM where a 72-lane slice costs
vector shuffles instead of HBM traffic. The fused qkv matmul itself is
faster than three separate ones (one pass over the activations; measured
176.8 vs 3x149.8 TF/s-equivalent at SigLIP shapes) and no HBM head-split or
q/k/v split ever materializes.

Forward-only; VJP recomputes through the XLA reference (the vision tower is
frozen in reference training, train.py:861-916). Reference behavior:
torch SDPA in SiglipAttention (HF modeling_siglip.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(qkv_ref, o_ref, *, num_heads, head_dim, scale, bb):
    # One dot pair per (image, head): [S, D] x [D, S] with S=729, D=72.
    # Images are looped (not flattened into one masked matmul) — a
    # block-diagonal (bb*S)^2 score matmul would waste bb x the FLOPs, and
    # the (bb*S, D) -> (bb, S, D) reshape is not sublane-aligned for Mosaic.
    # bb > 1 still amortizes grid pipeline latency across images.
    hd = num_heads * head_dim
    log2e = 1.4426950408889634
    for i in range(bb):
        row = qkv_ref[i]
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            # fold softmax scale AND log2(e) into q so the softmax uses the
            # VPU-native exp2 and never rescales an [S, S] matrix
            q = (
                row[:, h * head_dim : (h + 1) * head_dim].astype(jnp.float32)
                * (scale * log2e)
            ).astype(row.dtype)
            k = row[:, hd + h * head_dim : hd + (h + 1) * head_dim]
            v = row[:, 2 * hd + h * head_dim : 2 * hd + (h + 1) * head_dim]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(s, axis=-1, keepdims=True)
            # exp2 on bf16 (2x VPU rate): the argument is max-subtracted so
            # it lies in (-inf, 0] where bf16's relative precision (~2^-8)
            # perturbs each prob by <0.4% — and the pv matmul consumes bf16
            # anyway. The denominator accumulates in f32.
            p = jnp.exp2((s - m).astype(row.dtype))
            denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            # normalize the [S, D] output rather than the [S, S] probs
            o = jnp.dot(p, v, preferred_element_type=jnp.float32) / denom
            o_ref[i, :, sl] = o.astype(o_ref.dtype)


def _reference_packed(qkv, num_heads, scale):
    b, s, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // num_heads
    qh = qkv[..., :hd].reshape(b, s, num_heads, d)
    kh = qkv[..., hd : 2 * hd].reshape(b, s, num_heads, d)
    vh = qkv[..., 2 * hd :].reshape(b, s, num_heads, d)
    logits = (
        jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) * scale
    )
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(qkv.dtype), vh)
    return o.reshape(b, s, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def mha_full_attention_packed(
    qkv: jnp.ndarray,  # [B, S, 3*H*D], lane-concatenated [q | k | v]
    num_heads: int,
    head_dim: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Unmasked full attention over a packed qkv projection buffer."""
    return _forward(qkv, num_heads, head_dim, interpret)


def _forward(qkv, num_heads, head_dim, interpret):
    b, s, hd3 = qkv.shape
    assert hd3 == 3 * num_heads * head_dim, (hd3, num_heads, head_dim)
    hd = num_heads * head_dim
    scale = head_dim ** -0.5
    if not interpret and jax.default_backend() != "tpu":
        return _reference_packed(qkv, num_heads, scale)
    vmem_limit = 100 * 2 ** 20
    # cap the double-buffered qkv+o windows at 48 MiB: at SigLIP shapes this
    # selects bb=2 (26.9 MiB of windows); bb=4 measures 141.7 MiB total with
    # scratch + spills, past the chip's 128 MiB VMEM
    bb = 1
    while b % (bb * 2) == 0 and (bb * 2 * s) * 4 * hd * 2 * 2 < 48 * 2 ** 20:
        bb *= 2
    kernel = functools.partial(
        _kernel, num_heads=num_heads, head_dim=head_dim, scale=scale, bb=bb,
    )
    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[pl.BlockSpec((bb, s, hd3), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((bb, s, hd), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(qkv)


def _fwd(qkv, num_heads, head_dim, interpret):
    return _forward(qkv, num_heads, head_dim, interpret), (qkv,)


def _bwd(num_heads, head_dim, interpret, res, g):
    (qkv,) = res
    _, vjp = jax.vjp(
        lambda x: _reference_packed(x, num_heads, head_dim ** -0.5), qkv
    )
    return vjp(g)


mha_full_attention_packed.defvjp(_fwd, _bwd)


def mha_full_attention(q, k, v, num_heads, head_dim, interpret=False):
    """Split-input convenience wrapper (concatenates along lanes)."""
    return mha_full_attention_packed(
        jnp.concatenate([q, k, v], axis=-1), num_heads, head_dim, interpret
    )
