"""Int8 weight-only quantization for the LLM.

TPU-native counterpart of the reference's optional bitsandbytes 4/8-bit load
(reference: model/__init__.py:50-60, train.py:763-782): symmetric
per-output-channel int8 weights with fp32 scales. The dequant commutes with
the matmul (per-column scale applies to the output), so kernels are read
from HBM as int8 — halving decode's weight bandwidth — and the int8→bf16
convert fuses into the dot.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

def quantize_kernel(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[..., in, out] float kernel → {'q': int8, 'scale': f32[..., out]}.

    The reduction runs over the contraction (in) axis so scan-stacked
    [L, in, out] kernels quantize per layer per output column."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(
        jnp.round(wf / scale[..., None, :]), -127, 127
    ).astype(jnp.int8)
    return {"q": q, "scale": scale}


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """int values in [-8, 7], [..., in, out] → packed int8 [..., in/2, out]:
    row 2i biased by +8 in the low nibble ([0, 15]), row 2i+1 signed in the
    high nibble.

    Packed-int8 storage instead of native ``jnp.int4``: this runtime's PJRT
    client cannot relayout S4 arrays across the dispatch boundary
    (device_put recursion, PERF.md dead ends), so int4 weights live as int8
    bytes and are nibble-unpacked inside the jitted computation — S4 never
    exists outside a trace. The low nibble's +8 bias makes the in-kernel
    unpack branch-free on hardware without int8 vector shifts: lo+8 is
    ``p & 15`` (the sign correction folds into one small dot against
    precomputed activation group-sums, ops/quant_matmul.py), hi is an
    arithmetic ``p >> 4``."""
    qi = q.astype(jnp.int8)
    lo = (qi[..., 0::2, :] + 8) & 0xF
    hi = jnp.left_shift(qi[..., 1::2, :], 4)
    return (lo | hi).astype(jnp.int8)


def unpack_int4(q8: jnp.ndarray) -> jnp.ndarray:
    """Packed int8 [..., in/2, out] → int8 values in [-8, 7] [..., in, out]
    (the inverse of pack_int4: low nibble de-biased by 8, high nibble
    sign-extended)."""
    lo = (q8 & 0xF) - 8
    hi = jnp.right_shift(q8, 4)
    *lead, d2, dout = q8.shape
    return jnp.stack([lo, hi], axis=-2).reshape(*lead, d2 * 2, dout)


def quantize_kernel4(w: jnp.ndarray, group: int = 64) -> Dict[str, jnp.ndarray]:
    """[..., in, out] float kernel → {'q': packed int8 [..., in/2, out],
    'scale': f32[..., in/g, out]} with symmetric per-(input-group,
    output-column) scales — the TPU analog of bnb's blockwise 4-bit
    (reference model/__init__.py:52-58). See pack_int4 for why the 4-bit
    values are stored as packed int8 bytes."""
    wf = w.astype(jnp.float32)
    *lead, din, dout = wf.shape
    assert din % group == 0 and din % 2 == 0, (din, group)
    g = din // group
    wg = wf.reshape(*lead, g, group, dout)
    scale = jnp.max(jnp.abs(wg), axis=-2) / 7.0  # [..., g, out]
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(wg / scale[..., None, :]), -7, 7)
    return {
        "q": pack_int4(q.reshape(*lead, din, dout)),
        "scale": scale,
    }


def quantize_qwen2_params(
    params: Dict[str, Any], bits: int = 8, group: int = 64
) -> Dict[str, Any]:
    """Qwen2LM params → quantized layout consumed by
    Qwen2LM(quant=True/'int4').

    Every Dense kernel (attention projections, MLP, lm_head) is replaced by
    kernel_q/kernel_scale; embeddings and norms stay bf16/fp32.
    """
    assert bits in (4, 8), bits

    def qfn(w):
        if bits == 8:
            return quantize_kernel(w)
        return quantize_kernel4(w, group)

    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if "kernel" in v and getattr(v["kernel"], "ndim", 0) >= 2:
                    qd = qfn(jnp.asarray(v["kernel"]))
                    nv = {"kernel_q": qd["q"], "kernel_scale": qd["scale"]}
                    if "bias" in v:
                        nv["bias"] = v["bias"]
                    out[k] = nv
                else:
                    out[k] = walk(v)
            else:
                out[k] = v
        return out

    out = dict(params)
    out["layers"] = walk(params["layers"])
    out["lm_head"] = walk({"_": params["lm_head"]})["_"]
    return out
