"""SigLIP-SO400M vision tower, TPU-native.

Re-implements the behavior of the reference's frozen HF SiglipVisionModel
feature tap (reference: ufvideo/model/encoder.py:96-181): NHWC patchify conv,
learned position embeddings, pre-LN transformer, and the hidden-state tap at
``mm_vision_select_layer=-2`` (encoder.py:104,126-132) — meaning the final
encoder layer and post-layernorm are never executed, so they are not even
materialized here.

Layers are folded into a single ``nn.scan`` so the 26-layer encoder compiles
as one layer; attention dispatches to the Pallas flash kernel on TPU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import SiglipVisionConfig
from ..ops.attention import attention  # noqa: F401 (re-export for callers)
from ..ops.hiera_block import fused_hiera_block
from ..ops.vit_attention import mha_full_attention_packed
from .param_holders import AttnPairParams, LayerNormParams


class SiglipAttention(nn.Module):
    cfg: SiglipVisionConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # one fused qkv matmul: faster than three separate 1152x1152 ones
        # (one pass over the activations) and, unlike round-1's fused
        # attempt, nothing ever splits it back in HBM — the Pallas kernel
        # consumes the packed [B, S, 3*H*D] buffer and slices lanes in VMEM
        cfg = self.cfg
        qkv = nn.Dense(
            3 * cfg.hidden_size, dtype=self.dtype,
            param_dtype=self.param_dtype, name="qkv_proj",
        )(x)
        o = mha_full_attention_packed(qkv, cfg.num_heads, cfg.head_dim)
        return nn.Dense(
            cfg.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype,
            name="out_proj",
        )(o)


class SiglipMLP(nn.Module):
    cfg: SiglipVisionConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(
            self.cfg.intermediate_size, dtype=self.dtype,
            param_dtype=self.param_dtype, name="fc1",
        )(x)
        x = nn.gelu(x, approximate=True)  # gelu_pytorch_tanh
        return nn.Dense(
            self.cfg.hidden_size, dtype=self.dtype,
            param_dtype=self.param_dtype, name="fc2",
        )(x)


class SiglipAttentionInt8(nn.Module):
    """W8A8 projections around the bf16 Pallas attention kernel: the qkv
    and out matmuls (the tower's flop majority) run s8×s8→s32 on the MXU;
    the 72-lane attention contractions stay bf16 (their scores need the
    range, and they are a minority of the flops)."""

    cfg: SiglipVisionConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        from ..quant import W8A8Dense

        qkv = W8A8Dense(
            3 * cfg.hidden_size, dtype=self.dtype, name="qkv_proj"
        )(x)
        o = mha_full_attention_packed(qkv, cfg.num_heads, cfg.head_dim)
        return W8A8Dense(cfg.hidden_size, dtype=self.dtype, name="out_proj")(o)


class SiglipMLPInt8(nn.Module):
    cfg: SiglipVisionConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..quant import W8A8Dense

        x = W8A8Dense(
            self.cfg.intermediate_size, dtype=self.dtype, name="fc1"
        )(x)
        x = nn.gelu(x, approximate=True)
        return W8A8Dense(self.cfg.hidden_size, dtype=self.dtype, name="fc2")(x)


class SiglipEncoderLayer(nn.Module):
    cfg: SiglipVisionConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    ln_dtype: Any = jnp.float32  # norm compute dtype (bf16 = faster, looser)
    quant: bool = False  # W8A8 int8 dense layers (see quant.W8A8Dense)

    @nn.compact
    def __call__(self, x: jnp.ndarray, _) -> tuple:
        cfg = self.cfg
        if self.quant:
            import os

            if (
                jax.default_backend() == "tpu"
                and os.environ.get("UFVIDEO_SIGLIP_INT8_FUSED", "1") == "1"
            ):
                # whole-layer W8A8 kernel: activations make one HBM
                # round-trip, int8 weights VMEM-resident, quantize/rescale
                # fused around the s8xs8->s32 dots (ops/hiera_block.py)
                from .param_holders import QuantDenseParams

                ln1 = LayerNormParams(
                    cfg.hidden_size, self.param_dtype, name="layer_norm1"
                )()
                ln2 = LayerNormParams(
                    cfg.hidden_size, self.param_dtype, name="layer_norm2"
                )()

                class _Pair(nn.Module):
                    d: tuple  # ((in, out, name), (in, out, name))
                    dtype: Any = jnp.bfloat16

                    @nn.compact
                    def __call__(self):
                        out = []
                        for din, dout, nm in self.d:
                            out.extend(
                                QuantDenseParams(din, dout, self.dtype, name=nm)()
                            )
                        return out

                c, ims = cfg.hidden_size, cfg.intermediate_size
                wq, sq, bq, wp, sp, bp = _Pair(
                    (
                        (c, 3 * c, "qkv_proj"),
                        (c, c, "out_proj"),
                    ),
                    self.dtype, name="self_attn",
                )()
                w1, s1, b1, w2, s2, b2 = _Pair(
                    ((c, ims, "fc1"), (ims, c, "fc2")), self.dtype, name="mlp"
                )()
                from ..ops.hiera_block import fused_block_w8a8

                out = fused_block_w8a8(
                    x.astype(self.dtype),
                    (*ln1, wq, sq, bq, wp, sp, bp, *ln2,
                     w1, s1, b1, w2, s2, b2),
                    cfg.num_heads, cfg.head_dim,
                    act="gelu_tanh", eps=cfg.layer_norm_eps,
                )
                return out, None

            ln = lambda name: nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                param_dtype=self.param_dtype, name=name,
            )
            h = ln("layer_norm1")(x).astype(self.dtype)
            x = x + SiglipAttentionInt8(cfg, self.dtype, name="self_attn")(h)
            h = ln("layer_norm2")(x).astype(self.dtype)
            x = x + SiglipMLPInt8(cfg, self.dtype, name="mlp")(h)
            return x, None
        if self.ln_dtype == jnp.float32:
            # whole-layer fused kernel (ops/hiera_block.py): one image =
            # one 729-token "window"; LN1 → qkv → attention → proj → LN2 →
            # MLP in a single Pallas call with weights resident in VMEM
            ln1 = LayerNormParams(
                cfg.hidden_size, self.param_dtype, name="layer_norm1"
            )()
            wq, bq, wp, bp = AttnPairParams(
                cfg.hidden_size, 3 * cfg.hidden_size, cfg.hidden_size,
                self.param_dtype, qkv_name="qkv_proj", proj_name="out_proj",
                name="self_attn",
            )()
            ln2 = LayerNormParams(
                cfg.hidden_size, self.param_dtype, name="layer_norm2"
            )()
            w1, b1, w2, b2 = AttnPairParams(
                cfg.hidden_size, cfg.intermediate_size,
                cfg.intermediate_size, self.param_dtype,
                qkv_name="fc1", proj_name="fc2", name="mlp",
            )()
            import os

            act = {
                "tanh": "gelu_tanh",
                "poly": "gelu_tanh_poly",
                "poly_bf16": "gelu_tanh_poly_bf16",
            }.get(os.environ.get("UFVIDEO_SIGLIP_GELU", "tanh"), "gelu_tanh")
            out = fused_hiera_block(
                x.astype(self.dtype),
                (*ln1, wq, bq, wp, bp, *ln2, w1, b1, w2, b2),
                cfg.num_heads, cfg.head_dim, 0,
                act=act, eps=cfg.layer_norm_eps,
            )
            return out, None

        ln = lambda name: nn.LayerNorm(
            epsilon=self.cfg.layer_norm_eps, dtype=self.ln_dtype,
            param_dtype=self.param_dtype, name=name,
        )
        h = ln("layer_norm1")(x).astype(self.dtype)
        x = x + SiglipAttention(
            self.cfg, self.dtype, self.param_dtype, name="self_attn"
        )(h)
        h = ln("layer_norm2")(x).astype(self.dtype)
        x = x + SiglipMLP(self.cfg, self.dtype, self.param_dtype, name="mlp")(h)
        return x, None


class SiglipVisionTower(nn.Module):
    """Frames in, penultimate-layer patch features out.

    Input:  [B, H, W, 3] NHWC float (already resized + SigLIP-normalized).
    Output: [B, grid*grid, hidden] features (all patch tokens kept — SigLIP
    has no CLS token to strip, reference encoder.py:126-132).
    """

    cfg: SiglipVisionConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16
    ln_dtype: Any = jnp.float32
    # W8A8 int8 encoder (params from quant.quantize_vision_params): raises
    # the compute ceiling ~2x on the MXU for this compute-bound tower
    quant: bool = False

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b = pixels.shape[0]
        p, g = cfg.patch_size, cfg.grid_size
        # patchify as reshape + one MXU matmul: a VALID-strided conv over a
        # 3-channel input wastes most of the lane dim; the equivalent
        # [B*P, p*p*3] x [p*p*3, hidden] matmul runs at full tile density.
        # Param layout stays conv-shaped ([kh, kw, in, out]) for checkpoint
        # compatibility.
        kernel = self.param(
            "patch_embedding_kernel",
            nn.initializers.lecun_normal(),
            (p, p, 3, cfg.hidden_size),
            self.param_dtype,
        )
        bias = self.param(
            "patch_embedding_bias",
            nn.initializers.zeros,
            (cfg.hidden_size,),
            self.param_dtype,
        )
        px = pixels[:, : g * p, : g * p, :].astype(self.dtype)
        px = px.reshape(b, g, p, g, p, 3).transpose(0, 1, 3, 2, 4, 5)
        px = px.reshape(b, cfg.num_patches, p * p * 3)
        w = kernel.astype(self.dtype).reshape(p * p * 3, cfg.hidden_size)
        x = px @ w + bias.astype(self.dtype)

        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.num_patches, cfg.hidden_size),
            self.param_dtype,
        )
        x = x + pos[None].astype(self.dtype)

        layers = nn.scan(
            SiglipEncoderLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.num_encode_layers,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )(cfg, self.dtype, self.param_dtype, self.ln_dtype, self.quant,
          name="layers")
        x, _ = layers(x, None)
        return x


def encode_frames(model: SiglipVisionTower, params, frames: jnp.ndarray):
    """Encode a flat batch of frames [N, H, W, 3] → [N, P, hidden].

    Mirrors the (b·t) flattened batch encode of the reference
    (videorefer_arch.py:168-191).
    """
    return model.apply({"params": params}, frames)
