"""Hiera image-encoder trunk + FPN neck, TPU-native NHWC.

Re-implements the reference's Hiera-L trunk (reference: sam2.py:1134-1258),
windowed MultiScaleAttention/Block (:1000-1130), patch embed (:954-985),
window partition/unpartition (:905-950), and FpnNeck (:815-905).

Static-shape notes: at image_size 1024 the stage token grids are 256/128/64/32
and every window size divides its grid, so window partition is pure reshape —
no dynamic padding. The interpolated background pos-embed is precomputed at
init for the static grid.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...configs import SAM2Config, SAM2HieraConfig
from ...ops.attention import attention, window_dense_attention
from ...ops.window_attention import fused_window_attention
from .common import position_embedding_sine


def window_partition(x: jnp.ndarray, ws: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """[B, H, W, C] → [B*nW, ws, ws, C] with zero padding to multiples."""
    b, h, w, c = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return x, (hp, wp)


def window_unpartition(
    windows: jnp.ndarray, ws: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jnp.ndarray:
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // ws // ws)
    x = windows.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class MultiScaleAttention(nn.Module):
    """Windowed attention with optional q max-pooling (sam2.py:1000-1046).

    ``head_pad``: TPU layout optimization — each head occupies ``head_pad``
    lanes in the qkv/proj parameters (zero-padded columns/rows written by
    the converter), so the head-split reshape is 128-lane-aligned and never
    forces a padded relayout of the activations in HBM. The softmax scale
    stays ``real_head_dim**-0.5`` and zero pads contribute nothing, so the
    math is exact. Measured: the unaligned d=72 head split costs ~40% of
    the whole Hiera-L encode at 1024² (PERF.md).
    """

    dim_out: int
    num_heads: int
    q_stride: Optional[Tuple[int, int]] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    head_pad: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, H, W, C]
        b, h, w, _ = x.shape
        hd = self.dim_out // self.num_heads
        hp = self.head_pad or hd
        assert hp >= hd, (hp, hd)
        qkv = nn.Dense(
            3 * self.num_heads * hp, dtype=self.dtype,
            param_dtype=self.param_dtype, name="qkv",
        )(x.reshape(b, h * w, -1))

        scale = hd ** -0.5
        tokens = h * w
        # fused kernel for every windowed block (window sizes here are
        # 16-256 tokens); global blocks (4096 tokens) would need an online
        # softmax — they ride the flash kernel below instead
        if self.q_stride is None and tokens <= 512 and hp % 128 == 0:
            # windowed block: fused kernel, heads never split in HBM
            o = fused_window_attention(qkv, self.num_heads, hd, hp)
        else:
            qkv = qkv.reshape(b, tokens, 3, self.num_heads, hp)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            if self.q_stride is not None:
                sy, sx = self.q_stride
                q = q.reshape(b, h, w, self.num_heads * hp)
                q = nn.max_pool(q, window_shape=(sy, sx), strides=(sy, sx))
                h, w = q.shape[1], q.shape[2]
                q = q.reshape(b, h * w, self.num_heads, hp)
            if q.shape[1] >= 128:
                # global blocks ride the flash kernel
                o = attention(q, k, v, scale=scale)
            else:
                o = window_dense_attention(q, k, v, scale=scale)
        o = o.reshape(b, h, w, self.num_heads * hp)
        return nn.Dense(
            self.dim_out, dtype=self.dtype, param_dtype=self.param_dtype,
            name="proj",
        )(o)


class MultiScaleBlock(nn.Module):
    """Hiera block: LN → (windowed) attention (+q-pool) → residual → MLP
    (sam2.py:1049-1131)."""

    dim: int
    dim_out: int
    num_heads: int
    mlp_ratio: float = 4.0
    q_stride: Optional[Tuple[int, int]] = None
    window_size: int = 0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    head_pad: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ln = lambda name: nn.LayerNorm(
            epsilon=1e-6, dtype=jnp.float32, param_dtype=self.param_dtype,
            name=name,
        )
        shortcut = x
        xn = ln("norm1")(x).astype(self.dtype)

        if self.dim != self.dim_out:
            proj = nn.Dense(
                self.dim_out, dtype=self.dtype, param_dtype=self.param_dtype,
                name="proj",
            )(xn)
            if self.q_stride is not None:
                proj = nn.max_pool(
                    proj, window_shape=self.q_stride, strides=self.q_stride
                )
            shortcut = proj

        h, w = xn.shape[1], xn.shape[2]
        ws = self.window_size
        pad_hw = (h, w)
        att_in = xn
        if ws > 0:
            att_in, pad_hw = window_partition(xn, ws)

        att = MultiScaleAttention(
            self.dim_out, self.num_heads, self.q_stride,
            self.dtype, self.param_dtype, self.head_pad, name="attn",
        )(att_in)

        if self.q_stride is not None:
            # q pooling shrank spatial dims (sam2.py:1113-1120)
            ws = ws // self.q_stride[0] if ws > 0 else 0
            h, w = shortcut.shape[1], shortcut.shape[2]
            if self.window_size > 0:
                pad_h = (ws - h % ws) % ws
                pad_w = (ws - w % ws) % ws
                pad_hw = (h + pad_h, w + pad_w)
        if self.window_size > 0:
            att = window_unpartition(att, ws, pad_hw, (h, w))

        x = shortcut + att
        xn = ln("norm2")(x).astype(self.dtype)
        hidden = int(self.dim_out * self.mlp_ratio)
        m = nn.Dense(
            hidden, dtype=self.dtype, param_dtype=self.param_dtype,
            name="mlp_layers_0",
        )(xn)
        m = nn.gelu(m, approximate=False)
        m = nn.Dense(
            self.dim_out, dtype=self.dtype, param_dtype=self.param_dtype,
            name="mlp_layers_1",
        )(m)
        return x + m


class Hiera(nn.Module):
    """Multi-stage trunk returning per-stage NHWC feature maps
    (sam2.py:1134-1258)."""

    cfg: SAM2HieraConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        cfg = self.cfg
        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.patch_kernel, cfg.patch_kernel),
            strides=(cfg.patch_stride, cfg.patch_stride),
            padding=[(cfg.patch_padding, cfg.patch_padding)] * 2,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="patch_embed",
        )(x.astype(self.dtype))
        b, h, w, _ = x.shape

        # windowed background pos embed (sam2.py:1223-1232): bicubic-resized
        # background + tiled window embed
        bg = self.param(
            "pos_embed",
            nn.initializers.zeros,
            (*cfg.window_pos_embed_bkg_spatial_size, cfg.embed_dim),
            self.param_dtype,
        )
        win = self.param(
            "pos_embed_window",
            nn.initializers.zeros,
            (cfg.window_spec[0], cfg.window_spec[0], cfg.embed_dim),
            self.param_dtype,
        )
        bg_r = jax.image.resize(
            bg.astype(jnp.float32), (h, w, cfg.embed_dim), method="bicubic"
        )
        tiles = (h // win.shape[0], w // win.shape[1], 1)
        pos = bg_r + jnp.tile(win.astype(jnp.float32), tiles)
        x = x + pos[None].astype(x.dtype)

        stages = cfg.stages
        depth = sum(stages)
        stage_ends = [sum(stages[: i + 1]) - 1 for i in range(len(stages))]
        q_pool_blocks = [e + 1 for e in stage_ends[:-1]]

        outputs: List[jnp.ndarray] = []
        embed_dim, num_heads, cur_stage = cfg.embed_dim, cfg.num_heads, 1
        for i in range(depth):
            dim_out = embed_dim
            window_size = cfg.window_spec[cur_stage - 1]
            if i in cfg.global_att_blocks:
                window_size = 0
            if i - 1 in stage_ends:
                dim_out = int(embed_dim * cfg.dim_mul)
                num_heads = int(num_heads * cfg.head_mul)
                cur_stage += 1
            x = MultiScaleBlock(
                dim=embed_dim,
                dim_out=dim_out,
                num_heads=num_heads,
                mlp_ratio=cfg.mlp_ratio,
                q_stride=cfg.q_stride if i in q_pool_blocks else None,
                window_size=window_size,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                head_pad=cfg.head_pad,
                name=f"blocks_{i}",
            )(x)
            embed_dim = dim_out
            if i in stage_ends:
                outputs.append(x)
        return outputs  # low→high channel count (finest→coarsest spatial)


class FpnNeck(nn.Module):
    """FPN neck: 1x1 lateral convs + nearest top-down on levels 2,3
    (sam2.py:815-905); emits (features, sine pos embeds) finest-first."""

    cfg: SAM2Config
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray]):
        cfg = self.cfg
        n = len(xs) - 1
        out: List[Optional[jnp.ndarray]] = [None] * len(xs)
        pos: List[Optional[jnp.ndarray]] = [None] * len(xs)
        prev = None
        # xs is finest-first; reference indexes i=n..0 where xs[i] is level i
        # (level 0 = finest) and convs[n - i] handles level i
        for i in range(n, -1, -1):
            lateral = nn.Conv(
                cfg.fpn_dim, (1, 1), dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"convs_{n - i}",
            )(xs[i].astype(self.dtype))
            if i in cfg.fpn_top_down_levels and prev is not None:
                th, tw = lateral.shape[1], lateral.shape[2]
                top_down = jax.image.resize(
                    prev.astype(jnp.float32),
                    (prev.shape[0], th, tw, prev.shape[3]),
                    method="nearest",
                ).astype(lateral.dtype)
                prev = lateral + top_down
            else:
                prev = lateral
            out[i] = prev
            h, w = prev.shape[1], prev.shape[2]
            pos[i] = jnp.broadcast_to(
                position_embedding_sine(h, w, cfg.fpn_dim)[None],
                prev.shape,
            ).astype(prev.dtype)
        return out, pos
