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

import functools
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


def blockwise_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    kv_lens: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,  # [B, Skv] per-token mask
    scale: Optional[float] = None,
    chunk: int = 512,
) -> jnp.ndarray:
    """Online-softmax attention as a lax.scan over kv chunks, in pure XLA.

    Never materializes the [Sq, Skv] score matrix in HBM, and — unlike the
    Pallas kernel — is differentiable, with scan giving a memory-efficient
    (rematerializing) backward. Used as the VJP rule for the flash kernel.
    """
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    groups = hq // hkv
    scale = (d ** -0.5) if scale is None else scale
    n_chunks = -(-skv // chunk)
    pad = n_chunks * chunk - skv
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    lens = kv_lens if kv_lens is not None else jnp.full((b,), skv, jnp.int32)
    mask_full = (
        jnp.pad(kv_mask.astype(bool), ((0, 0), (0, pad)))
        if kv_mask is not None
        else jnp.ones((b, n_chunks * chunk), bool)
    )
    mc = mask_full.reshape(b, n_chunks, chunk).transpose(1, 0, 2)

    qf = (q.astype(jnp.float32) * scale).reshape(b, sq, hkv, groups, d)
    kc = kp.reshape(b, n_chunks, chunk, hkv, d).transpose(1, 0, 2, 3, 4)
    vc = vp.reshape(b, n_chunks, chunk, hkv, d).transpose(1, 0, 2, 3, 4)
    offset = skv - sq

    def step(carry, xs):
        m_prev, l_prev, acc = carry
        ci, kb, vb, mb = xs  # kb/vb: [B, chunk, hkv, d]; mb: [B, chunk]
        s = jnp.einsum(
            "bqhgd,bkhd->bhgqk", qf, kb.astype(jnp.float32)
        )  # [B, hkv, g, sq, chunk]
        col = ci * chunk + jnp.arange(chunk)
        valid = (col[None, :] < lens[:, None]) & mb  # [B, chunk]
        s = jnp.where(valid[:, None, None, None, :], s, _NEG_INF)
        if causal:
            row = jnp.arange(sq)
            cmask = (col[None, :] - offset) <= row[:, None]  # [sq, chunk]
            s = jnp.where(cmask[None, None, None], s, _NEG_INF)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        m_safe = jnp.maximum(m_new, _NEG_INF / 2)
        p = jnp.exp(s - m_safe[..., None])
        corr = jnp.exp(jnp.maximum(m_prev, _NEG_INF / 2) - m_safe)
        l_new = l_prev * corr + jnp.sum(p, axis=-1)
        pv = jnp.einsum("bhgqk,bkhd->bhgqd", p, vb.astype(jnp.float32))
        acc = acc * corr[..., None] + pv
        return (m_new, l_new, acc), None

    init = (
        jnp.full((b, hkv, groups, sq), _NEG_INF, jnp.float32),
        jnp.zeros((b, hkv, groups, sq), jnp.float32),
        jnp.zeros((b, hkv, groups, sq, d), jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(
        step, init, (jnp.arange(n_chunks), kc, vc, mc)
    )
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    out = out.transpose(0, 3, 1, 2, 4).reshape(b, sq, hq, d)
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 6))
def _flash_attention_ad(q, k, v, causal, kv_lens, kv_mask, scale):
    from .flash_attention import flash_attention

    return flash_attention(
        q, k, v, causal=causal, kv_lens=kv_lens, kv_mask=kv_mask, scale=scale
    )


def _flash_ad_fwd(q, k, v, causal, kv_lens, kv_mask, scale):
    out = _flash_attention_ad(q, k, v, causal, kv_lens, kv_mask, scale)
    return out, (q, k, v, kv_lens, kv_mask)


def _flash_ad_bwd(causal, scale, residuals, g):
    q, k, v, kv_lens, kv_mask = residuals
    _, vjp = jax.vjp(
        lambda q_, k_, v_: blockwise_attention(
            q_, k_, v_, causal=causal, kv_lens=kv_lens, kv_mask=kv_mask,
            scale=scale,
        ),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_flash_attention_ad.defvjp(_flash_ad_fwd, _flash_ad_bwd)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    kv_lens: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,  # [B, Skv] per-token validity
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Multi-head (grouped-query) attention.

    impl: "auto" (Pallas on TPU when profitable), "pallas", or "xla".
    ``mask`` is only supported on the XLA path (arbitrary boolean masks are
    not worth a kernel; the hot paths use causal/kv_lens). The Pallas path
    is differentiable: its VJP recomputes through the blockwise XLA
    implementation (flash-style memory footprint either way).
    """
    if impl == "auto":
        import os

        forced = os.environ.get("UFVIDEO_ATTN_IMPL")
        if forced == "identity":
            # the identity ablation corrupts every output in the framework;
            # it is reachable only via an explicit impl= from bench code.
            raise ValueError(
                "UFVIDEO_ATTN_IMPL=identity is not honored (benchmark-only "
                "ablation); pass impl='identity' explicitly from bench code"
            )
        if forced:
            # arbitrary masks are XLA-only; never let the override silently
            # drop them on the kernel path
            impl = "xla" if (forced == "pallas" and mask is not None) else forced
        else:
            use_pallas = (
                _on_tpu()
                and mask is None
                and q.shape[1] >= 128
                and k.shape[1] >= 128
            )
            impl = "pallas" if use_pallas else "xla"
    if impl == "pallas":
        if mask is not None:
            raise ValueError(
                "impl='pallas' does not support an arbitrary `mask`; use "
                "causal/kv_lens/kv_mask or impl='xla'"
            )
        return _flash_attention_ad(q, k, v, causal, kv_lens, kv_mask, scale)
    if impl == "identity":
        # benchmark-only ablation: bypasses attention math entirely
        hq = q.shape[2]
        hkv = k.shape[2]
        if hq != hkv:
            import jax.numpy as _jnp
            return _jnp.repeat(v, hq // hkv, axis=2).astype(q.dtype)
        return v.astype(q.dtype)
    if impl == "blockwise":
        if mask is not None:
            # blockwise has no arbitrary-mask support — fall through to the
            # XLA path rather than silently returning unmasked attention
            impl = "xla"
        else:
            return blockwise_attention(
                q, k, v, causal=causal, kv_lens=kv_lens, kv_mask=kv_mask,
                scale=scale,
            )
    if kv_mask is not None:
        km = jnp.broadcast_to(
            kv_mask[:, None, :], (kv_mask.shape[0], q.shape[1], kv_mask.shape[1])
        )
        # fold kv validity INTO an explicit mask instead of dropping it —
        # both constraints must hold
        mask = km if mask is None else jnp.logical_and(mask, km)
    return xla_attention(
        q, k, v, causal=causal, kv_lens=kv_lens, mask=mask, scale=scale
    )


def window_dense_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
) -> jnp.ndarray:
    """Unmasked attention for small windows (SAM2 Hiera's windowed stages),
    in the inputs' dtype with fp32 softmax accumulation.

    Unlike :func:`xla_attention` this never upcasts q/k/v to fp32 in HBM —
    at thousands of tiny windows per frame that upcast (plus fp32 score
    materialization) dominates the image-encoder runtime. No GQA, no masks:
    window attention needs neither.
    """
    b, sq, hq, d = q.shape
    assert k.shape[2] == hq, (k.shape, hq)
    logits = (
        jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v)


def decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    cache_len: jnp.ndarray,
    *,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Single-step decode attention against a padded KV cache.

    q: [B, 1, Hq, D]; k_cache/v_cache: [B, Hkv, max_len, D] (kernel-native
    layout); cache_len: [B] valid entries (including the current step).
    With ``k_scale``/``v_scale`` [B, Hkv, max_len] the cache is int8
    per-position-quantized (half the HBM read traffic of bf16); the scales
    are folded into the scores/probs inside the kernel.

    Dispatches to the Pallas ragged decode kernel on TPU; XLA masked softmax
    elsewhere.
    """
    b, one, hq, d = q.shape
    hkv = k_cache.shape[1]
    groups = hq // hkv
    quantized = k_scale is not None
    if _on_tpu():
        qg = q[:, 0].reshape(b, hkv, groups, d)
        if quantized:
            from .decode_attention import ragged_decode_attention_q8

            out = ragged_decode_attention_q8(
                qg, k_cache, v_cache, k_scale, v_scale, cache_len, scale=scale
            )
        else:
            from .decode_attention import ragged_decode_attention

            out = ragged_decode_attention(
                qg, k_cache, v_cache, cache_len, scale=scale
            )
        return out.reshape(b, 1, hq, d)
    if quantized:
        k_cache = (k_cache.astype(jnp.float32) * k_scale[..., None]).astype(
            q.dtype
        )
        v_cache = (v_cache.astype(jnp.float32) * v_scale[..., None]).astype(
            q.dtype
        )
    return xla_attention(
        q,
        k_cache.transpose(0, 2, 1, 3),
        v_cache.transpose(0, 2, 1, 3),
        kv_lens=cache_len,
        scale=scale,
    )
