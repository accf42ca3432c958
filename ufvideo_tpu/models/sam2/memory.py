"""SAM2 memory subsystem: memory attention (axial-RoPE) + memory encoder.

Re-implements the reference MemoryAttention(Layer) (reference:
sam2.py:462-614), RoPEAttention with rope_k_repeat and num_k_exclude_rope
(:1498-1562), MaskDownSampler (:616-660), CXBlock/Fuser (:661-737), and
MemoryEncoder (:738-783). All spatial tensors are NHWC; token streams are
[B, N, C]. Dropout layers are inference no-ops (the reference trains SAM2
frozen, videorefer_arch.py:130).

The variable-length memory bank is handled with a per-token kv validity mask
instead of the reference's dynamic list concatenation, so the whole attention
stack is static-shape.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...configs import SAM2Config
from ...ops.attention import attention
from ...ops.rope import apply_rope_interleaved, axial_rope_cos_sin
from .common import ChannelLayerNorm


class RoPEAttention(nn.Module):
    """Projection attention with 2-D axial RoPE on the spatial tokens
    (sam2.py:1498-1562). Trailing ``num_k_exclude_rope`` k tokens (object
    pointers) skip rotation; with ``rope_k_repeat`` the q-grid rope table is
    tiled across k's stacked memory frames."""

    cfg: SAM2Config
    rope_k_repeat: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,  # [B, Nq, C]
        k: jnp.ndarray,  # [B, Nk, kv_in]
        v: jnp.ndarray,
        num_k_exclude_rope: int = 0,
        kv_mask: Optional[jnp.ndarray] = None,  # [B, Nk] bool
    ) -> jnp.ndarray:
        cfg = self.cfg
        c = cfg.mem_attn_dim
        heads = cfg.mem_attn_num_heads
        hd = c // heads
        dense = lambda feats, name: nn.Dense(
            feats, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        b, nq, _ = q.shape
        nk = k.shape[1]
        qp = dense(c, "q_proj")(q).reshape(b, nq, heads, hd)
        kp = dense(c, "k_proj")(k).reshape(b, nk, heads, hd)
        vp = dense(c, "v_proj")(v).reshape(b, nk, heads, hd)

        # axial rope over the (assumed square) q token grid
        side = int(round(nq ** 0.5))
        assert side * side == nq, (nq,)
        cos, sin = axial_rope_cos_sin(hd, side, side, cfg.mem_attn_rope_theta)
        cos_q = cos[None, :, None, :]
        sin_q = sin[None, :, None, :]
        qp = apply_rope_interleaved(qp, cos_q, sin_q)

        num_k_rope = nk - num_k_exclude_rope
        if num_k_rope > 0:
            if num_k_rope != nq:
                assert self.rope_k_repeat and num_k_rope % nq == 0, (num_k_rope, nq)
                reps = num_k_rope // nq
                cos_k = jnp.tile(cos, (reps, 1))[None, :, None, :]
                sin_k = jnp.tile(sin, (reps, 1))[None, :, None, :]
            else:
                cos_k, sin_k = cos_q, sin_q
            k_rot = apply_rope_interleaved(kp[:, :num_k_rope], cos_k, sin_k)
            kp = jnp.concatenate([k_rot, kp[:, num_k_rope:]], axis=1)

        # per-token kv validity rides the flash kernel's masked path on TPU
        o = attention(qp, kp, vp, kv_mask=kv_mask)
        return dense(cfg.mem_attn_dim, "out_proj")(o.reshape(b, nq, c))


class MemoryAttentionLayer(nn.Module):
    """Self-attn (RoPE) → cross-attn to memory (RoPE, kv_in 64) → FFN
    (sam2.py:462-546)."""

    cfg: SAM2Config
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,  # [B, Nq, C]
        memory: jnp.ndarray,  # [B, Nk, mem_dim]
        pos: jnp.ndarray,  # [B, Nk, mem_dim] memory pos enc
        query_pos: jnp.ndarray,  # [B, Nq, C]
        num_k_exclude_rope: int = 0,
        kv_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(
            epsilon=1e-5,  # torch nn.LayerNorm default (reference uses it)
            dtype=jnp.float32, param_dtype=self.param_dtype, name=name
        )
        # self-attention (pos_enc_at_attn=False → no pos added)
        t2 = ln("norm1")(tgt).astype(self.dtype)
        t2 = RoPEAttention(
            cfg, dtype=self.dtype, param_dtype=self.param_dtype,
            name="self_attn",
        )(t2, t2, t2)
        tgt = tgt + t2

        # cross-attention: keys get pos added (pos_enc_at_cross_attn_keys)
        t2 = ln("norm2")(tgt).astype(self.dtype)
        t2 = RoPEAttention(
            cfg, rope_k_repeat=True,  # k/v input width inferred from the memory tensor
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="cross_attn_image",
        )(
            t2,
            (memory + pos).astype(self.dtype),
            memory.astype(self.dtype),
            num_k_exclude_rope=num_k_exclude_rope,
            kv_mask=kv_mask,
        )
        tgt = tgt + t2

        t2 = ln("norm3")(tgt).astype(self.dtype)
        t2 = nn.Dense(
            cfg.mem_attn_dff, dtype=self.dtype, param_dtype=self.param_dtype,
            name="linear1",
        )(t2)
        t2 = nn.relu(t2)
        t2 = nn.Dense(
            cfg.mem_attn_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="linear2",
        )(t2)
        return tgt + t2


class MemoryAttention(nn.Module):
    """4-layer memory attention with 0.1-scaled input pos enc
    (sam2.py:548-614)."""

    cfg: SAM2Config
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        curr: jnp.ndarray,  # [B, Nq, C] current frame features
        curr_pos: jnp.ndarray,  # [B, Nq, C]
        memory: jnp.ndarray,  # [B, Nk, mem_dim]
        memory_pos: jnp.ndarray,  # [B, Nk, mem_dim]
        num_obj_ptr_tokens: int = 0,
        kv_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        out = curr + 0.1 * curr_pos  # pos_enc_at_input (sam2.py:585-586)
        for i in range(cfg.mem_attn_layers):
            out = MemoryAttentionLayer(
                cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layers_{i}",
            )(
                out, memory, memory_pos, curr_pos,
                num_k_exclude_rope=num_obj_ptr_tokens,
                kv_mask=kv_mask,
            )
        return nn.LayerNorm(
            epsilon=1e-5,  # torch nn.LayerNorm default (reference uses it)
            dtype=jnp.float32, param_dtype=self.param_dtype, name="norm"
        )(out).astype(self.dtype)


class MaskDownSampler(nn.Module):
    """1024² mask → 64²×C via 4 stride-2 convs + LN + GELU + 1x1 projection
    (sam2.py:616-660; kernel 3, stride 2, padding 1, total stride 16)."""

    cfg: SAM2Config
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, masks: jnp.ndarray) -> jnp.ndarray:  # [B, H, W, 1]
        x = masks.astype(self.dtype)
        chans = 1
        for i in range(4):
            out_ch = chans * 4
            x = nn.Conv(
                out_ch, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"encoder_{3 * i}",
            )(x)
            x = ChannelLayerNorm(
                param_dtype=self.param_dtype, name=f"encoder_{3 * i + 1}"
            )(x).astype(self.dtype)
            x = nn.gelu(x, approximate=False)
            chans = out_ch
        return nn.Conv(
            self.cfg.sam_embed_dim, (1, 1), dtype=self.dtype,
            param_dtype=self.param_dtype, name="encoder_12",
        )(x)


class CXBlock(nn.Module):
    """ConvNeXt block with layer-scale (sam2.py:661-719; the checkpoint's
    renamed ``g_weight`` layer-scale, :30-85)."""

    dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inp = x
        h = nn.Conv(
            self.dim, (7, 7), padding=[(3, 3), (3, 3)],
            feature_group_count=self.dim, dtype=self.dtype,
            param_dtype=self.param_dtype, name="dwconv",
        )(x.astype(self.dtype))
        h = ChannelLayerNorm(param_dtype=self.param_dtype, name="norm")(h)
        h = nn.Dense(
            4 * self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="pwconv1",
        )(h.astype(self.dtype))
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(
            self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="pwconv2",
        )(h)
        gamma = self.param(
            "g_weight",
            nn.initializers.constant(1e-6),
            (self.dim,),
            self.param_dtype,
        )
        return inp + gamma.astype(h.dtype) * h


class MemoryEncoder(nn.Module):
    """Fuse pixel features with the downsampled predicted mask into a
    mem_dim memory map (sam2.py:738-783)."""

    cfg: SAM2Config
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, pix_feat: jnp.ndarray, masks: jnp.ndarray,
        skip_mask_sigmoid: bool = False,
    ) -> jnp.ndarray:
        """pix_feat [B, H, W, C]; masks [B, 16H, 16W, 1] → [B, H, W, mem_dim]."""
        cfg = self.cfg
        if not skip_mask_sigmoid:
            masks = nn.sigmoid(masks)
        m = MaskDownSampler(
            cfg, self.dtype, self.param_dtype, name="mask_downsampler"
        )(masks)
        x = nn.Conv(
            cfg.sam_embed_dim, (1, 1), dtype=self.dtype,
            param_dtype=self.param_dtype, name="pix_feat_proj",
        )(pix_feat.astype(self.dtype))
        x = x + m
        for i in range(2):
            x = CXBlock(
                cfg.sam_embed_dim, self.dtype, self.param_dtype,
                name=f"fuser_layers_{i}",
            )(x)
        return nn.Conv(
            cfg.mem_dim, (1, 1), dtype=self.dtype,
            param_dtype=self.param_dtype, name="out_proj",
        )(x)
