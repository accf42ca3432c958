"""Unified attention entry point.

Replaces the reference's CUDA attention paths — flash-attn 2 for the LLM
(reference: train.py:973, model/__init__.py:64-65) and torch SDPA flash
kernels for SAM2 (sam2.py:1484-1490, 1551-1557) — with a single API that
dispatches to a Pallas TPU flash kernel for long sequences and a fused XLA
reference path elsewhere (small shapes, CPU tests, and numerics checks).

Conventions: q [B, Sq, Hq, D], k/v [B, Skv, Hkv, D] with Hq % Hkv == 0 (GQA).
Output [B, Sq, Hq, D] in q.dtype; softmax in float32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    kv_lens: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Reference attention in pure XLA (fp32 softmax)."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    assert hq % hkv == 0, (hq, hkv)
    groups = hq // hkv
    scale = (d ** -0.5) if scale is None else scale

    # grouped-query layout: contract against the shared kv head directly —
    # never materialize a repeated KV (groups x HBM traffic on decode)
    qf = (q.astype(jnp.float32) * scale).reshape(b, sq, hkv, groups, d)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    logits = jnp.einsum("bqhgd,bkhd->bhgqk", qf, kf)
    logits = logits.reshape(b, hq, sq, skv)

    if causal:
        qi = jnp.arange(sq)[:, None]
        ki = jnp.arange(skv)[None, :]
        # align last q position with last kv position (supports prefill where
        # skv == sq and decode-style queries appended at the end)
        causal_mask = (ki - (skv - sq)) <= qi
        logits = jnp.where(causal_mask[None, None], logits, _NEG_INF)
    if kv_lens is not None:
        ki = jnp.arange(skv)[None, :]
        valid = ki < kv_lens[:, None]
        logits = jnp.where(valid[:, None, None, :], logits, _NEG_INF)
    if mask is not None:
        if mask.ndim == 2:  # [Sq, Skv]
            mask = mask[None, None]
        elif mask.ndim == 3:  # [B, Sq, Skv]
            mask = mask[:, None]
        logits = jnp.where(mask, logits, _NEG_INF)

    # guard fully-masked rows (padding queries) against NaN
    row_max = jnp.max(logits, axis=-1, keepdims=True)
    row_max = jnp.maximum(row_max, _NEG_INF / 2)
    probs = jnp.exp(logits - row_max)
    denom = jnp.sum(probs, axis=-1, keepdims=True)
    probs = probs / jnp.maximum(denom, 1e-30)
    probs = probs.reshape(b, hkv, groups, sq, skv)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, vf)
    return out.reshape(b, sq, hq, d).astype(q.dtype)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    kv_lens: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Multi-head (grouped-query) attention.

    impl: "auto" (Pallas on TPU when profitable), "pallas", or "xla".
    ``mask`` is only supported on the XLA path (arbitrary boolean masks are
    not worth a kernel; the hot paths use causal/kv_lens).
    """
    if impl == "auto":
        import os

        forced = os.environ.get("UFVIDEO_ATTN_IMPL")
        if forced:
            impl = forced
        else:
            use_pallas = (
                _on_tpu()
                and mask is None
                and q.shape[1] >= 128
                and k.shape[1] >= 128
            )
            impl = "pallas" if use_pallas else "xla"
    if impl == "pallas":
        from .flash_attention import flash_attention

        return flash_attention(
            q, k, v, causal=causal, kv_lens=kv_lens, scale=scale
        )
    return xla_attention(
        q, k, v, causal=causal, kv_lens=kv_lens, mask=mask, scale=scale
    )


def decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    cache_len: jnp.ndarray,
    *,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Single-step decode attention against a padded KV cache.

    q: [B, 1, Hq, D]; k_cache/v_cache: [B, Hkv, max_len, D] (kernel-native
    layout); cache_len: [B] valid entries (including the current step).

    Dispatches to the Pallas ragged decode kernel on TPU; XLA masked softmax
    elsewhere.
    """
    b, one, hq, d = q.shape
    hkv = k_cache.shape[1]
    groups = hq // hkv
    if _on_tpu():
        from .decode_attention import ragged_decode_attention

        qg = q[:, 0].reshape(b, hkv, groups, d)
        out = ragged_decode_attention(
            qg, k_cache, v_cache, cache_len, scale=scale
        )
        return out.reshape(b, 1, hq, d)
    return xla_attention(
        q,
        k_cache.transpose(0, 2, 1, 3),
        v_cache.transpose(0, 2, 1, 3),
        kv_lens=cache_len,
        scale=scale,
    )
