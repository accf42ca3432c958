"""Int8 quantization: weight-only for the LLM, weight+activation (W8A8)
for the vision towers.

TPU-native counterpart of the reference's optional bitsandbytes 4/8-bit load
(reference: model/__init__.py:50-60, train.py:763-782): symmetric
per-output-channel int8 weights with fp32 scales. The dequant commutes with
the matmul (per-column scale applies to the output), so kernels are read
from HBM as int8 — halving decode's weight bandwidth — and the int8→bf16
convert fuses into the dot.

W8A8 (``W8A8Dense``) additionally quantizes the ACTIVATIONS per token, so
the dot itself runs s8×s8→s32 on the MXU — 2× the bf16 MXU peak on v5e.
That targets the compute-bound encoders (SigLIP runs at 70% of the bf16
flop ceiling; int8 raises the ceiling), not the bandwidth-bound decode.
Both scales are constant along the contraction axis (weight scale
per-output-column, activation scale per-row), so the product folds into
one elementwise rescale of the int32 accumulator — exact up to the
quantization itself.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
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


def _quantize_dense_tree(tree: Dict[str, Any], qfn) -> Dict[str, Any]:
    """Replace every {'kernel': [..., in, out], ...} dict in the tree with
    {'kernel_q', 'kernel_scale'} (bias kept); everything else unchanged."""

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

    return walk(tree)


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

    out = dict(params)
    out["layers"] = _quantize_dense_tree(params["layers"], qfn)
    out["lm_head"] = _quantize_dense_tree({"_": params["lm_head"]}, qfn)["_"]
    return out


def quantize_vision_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Vision-tower params → the W8A8 layout consumed by
    ``SiglipVisionTower(quant=True)`` / the Hiera int8 path: every encoder
    Dense kernel becomes kernel_q/kernel_scale; patch embedding, position
    embeddings and norm params stay in the float dtype (they are a
    negligible share of both flops and bytes)."""
    return _quantize_dense_tree(params, quantize_kernel)


def quantize_sam2_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """SAM2 params → the layout ``SAM2(quant=True)`` consumes: ONLY the
    Hiera trunk blocks' dense kernels become W8A8 (the encode hot path);
    patch embed, FPN neck convs, prompt/mask/memory heads stay float."""
    out = dict(params)
    trunk = dict(params["image_encoder_trunk"])
    for k, v in trunk.items():
        if k.startswith("blocks_"):
            trunk[k] = _quantize_dense_tree(v, quantize_kernel)
    out["image_encoder_trunk"] = trunk
    return out


def quantize_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic per-row (per-token) symmetric int8 activation quantization:
    [..., d] float → (int8 [..., d], f32 scales [..., 1])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.round(xf / scale).astype(jnp.int8)
    return q, scale


class W8A8Dense(nn.Module):
    """Dense with int8 weights AND dynamically int8-quantized activations:
    the dot runs s8×s8→s32 on the MXU (2× bf16 peak on v5e). For
    compute-bound encoder towers; the LLM keeps weight-only int8 (decode is
    bandwidth-bound, and W8A8 logits quality is not needed there)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        din = x.shape[-1]
        q = self.param(
            "kernel_q", nn.initializers.zeros, (din, self.features), jnp.int8
        )
        scale = self.param(
            "kernel_scale", nn.initializers.ones, (self.features,),
            jnp.float32,
        )
        qx, xscale = quantize_rows(x)
        y = jax.lax.dot_general(
            qx, q, (((qx.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (y.astype(jnp.float32) * xscale * scale).astype(self.dtype)
        if self.use_bias:
            y = y + self.param(
                "bias", nn.initializers.zeros, (self.features,), self.dtype
            ).astype(self.dtype)
        return y
