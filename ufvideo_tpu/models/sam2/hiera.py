"""Hiera image-encoder trunk + FPN neck, TPU-native.

Re-implements the behavior of the reference's Hiera-L trunk (reference:
sam2.py:1134-1258), windowed MultiScaleAttention/Block (:1000-1130), patch
embed (:954-985), window partition/unpartition (:905-950), and FpnNeck
(:815-905).

Layout design (the round-2 performance rewrite): the reference — and the
round-1 port — carries activations as 4D NHWC maps and window-partitions
around every attention. On TPU that is doubly hostile: XLA assigns
convolution-style layouts to dot_generals over 4D NHWC operands (measured:
stage-3 MLP matmuls ran at ~59 TF/s with `{2,3,1,0}` W-minor layouts and a
conv emitter), and the per-block partition/unpartition transposes cost
~56 ms of a 318 ms 8-frame encode. Here the trunk instead runs on 3D token
arrays in **window-major order** ([B*nW, ws*ws, C]): every Dense/LN is a
clean 2D matmul, the fused window-attention kernel consumes the layout
directly with zero per-block copies, and global attention — which is
permutation-invariant over tokens — rides the same layout via a free
reshape to [B, T, C]. Spatial layout is materialized only where geometry
matters: q-pooling boundaries (4 blocks) and the per-stage FPN outputs.

Static-shape notes: at image_size 1024 the stage token grids are 256/128/64/32
and every window size divides its grid, so window partition is pure
reshape+transpose with no padding. Padding is still supported for windowed
blocks, but only approximately: the pad rows are zeroed once at stage entry,
not re-zeroed after each block, so across a multi-block stage they pass
through LayerNorm (LN(0) = bias) and accumulate residuals, perturbing
edge-window attention keys relative to the reference's per-block F.pad.
Latent at every shipped config (all window sides divide all stage grids);
global blocks require an unpadded grid outright.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...configs import SAM2Config, SAM2HieraConfig
from ...ops.attention import attention, window_dense_attention
from ...ops.hiera_block import (
    fused_block_tail,
    fused_hiera_block,
    fused_hiera_stage,
    fused_ln_matmul,
    fused_qpool_block,
)
from ..param_holders import (
    AttnPairParams as _AttnP,
    DenseParams as _DenseP,
    LayerNormParams as _LNP,
)
from ...ops.window_attention import fused_window_attention
from .common import position_embedding_sine


def _hiera_act() -> str:
    """Kernel GELU implementation: exact A-S erf (default) or the minimax
    polynomial (UFVIDEO_HIERA_GELU=poly|poly_bf16 — |err| ≤ 1.1e-4 vs exact,
    below the kernels' bf16 output quantization; PERF.md r3)."""
    import os

    return {
        "exact": "gelu_exact",
        "poly": "gelu_poly",
        "poly_bf16": "gelu_poly_bf16",
    }.get(os.environ.get("UFVIDEO_HIERA_GELU", "exact"), "gelu_exact")


def to_windows(x: jnp.ndarray, ws: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """[B, H, W, C] → ([B*nW, ws*ws, C] window-major tokens, (Hp, Wp))."""
    b, h, w, c = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
    return x, (hp, wp)


def from_windows(
    tokens: jnp.ndarray, ws: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jnp.ndarray:
    """[B*nW, ws*ws, C] window-major tokens → [B, H, W, C] (crops padding)."""
    hp, wp = pad_hw
    h, w = hw
    b = tokens.shape[0] // (hp * wp // ws // ws)
    x = tokens.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class MultiScaleAttention(nn.Module):
    """Windowed/global attention with optional q max-pooling
    (sam2.py:1000-1046), on window-major tokens.

    ``window_side``: tokens-per-window side (S == side²); 0 = global block
    (input is [B, T, C]). ``head_pad``: TPU layout optimization — each head
    occupies ``head_pad`` lanes in the qkv/proj parameters (zero-padded
    columns/rows written by the converter), so head slicing is 128-lane-
    aligned and never forces a padded relayout in HBM. The softmax scale
    stays ``real_head_dim**-0.5`` and zero pads contribute nothing, so the
    math is exact.
    """

    dim_out: int
    num_heads: int
    window_side: int = 0  # 0 = global
    q_stride: Optional[Tuple[int, int]] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    head_pad: int = 0
    quant: bool = False  # W8A8 int8 projections (quant.W8A8Dense)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [N, S, C]
        n, s, _ = x.shape
        hd = self.dim_out // self.num_heads
        hp = self.head_pad or hd
        assert hp >= hd, (hp, hd)
        scale = hd ** -0.5
        if self.quant:
            from ...quant import W8A8Dense

            dense = lambda feats, name: W8A8Dense(
                feats, dtype=self.dtype, name=name
            )
        else:
            dense = lambda feats, name: nn.Dense(
                feats, dtype=self.dtype, param_dtype=self.param_dtype,
                name=name,
            )
        qkv = dense(3 * self.num_heads * hp, "qkv")(x)
        # [N, S, 3*H*hp] — the fused kernel's native layout

        if self.q_stride is not None:
            # q pooled within each window (sam2.py:1021-1033); window sides
            # always divide by the stride in supported configs
            sy, sx = self.q_stride
            ws = self.window_side
            assert ws % sy == 0 and ws % sx == 0, (ws, self.q_stride)
            hw = self.num_heads * hp
            q = qkv[..., :hw].reshape(n, ws, ws, hw)
            q = nn.max_pool(q, window_shape=(sy, sx), strides=(sy, sx))
            sq = (ws // sy) * (ws // sx)
            q = q.reshape(n, sq, self.num_heads, hp)
            k = qkv[..., hw : 2 * hw].reshape(n, s, self.num_heads, hp)
            v = qkv[..., 2 * hw :].reshape(n, s, self.num_heads, hp)
            o = window_dense_attention(q, k, v, scale=scale)
            o = o.reshape(n, sq, self.num_heads * hp)
        elif self.window_side == 0:
            # global block: tokens in any consistent order; flash kernel
            parts = qkv.reshape(n, s, 3, self.num_heads, hp)
            o = attention(
                parts[:, :, 0], parts[:, :, 1], parts[:, :, 2], scale=scale
            )
            o = o.reshape(n, s, self.num_heads * hp)
        elif s <= 512:
            # windowed block: fused kernel, heads never split in HBM
            # (72-lane head slices cost VMEM shuffles, not HBM relayouts)
            o = fused_window_attention(qkv, self.num_heads, hd, hp)
        else:
            parts = qkv.reshape(n, s, 3, self.num_heads, hp)
            o = window_dense_attention(
                parts[:, :, 0], parts[:, :, 1], parts[:, :, 2], scale=scale
            )
            o = o.reshape(n, s, self.num_heads * hp)
        return dense(self.dim_out, "proj")(o)


class MultiScaleBlock(nn.Module):
    """Hiera block: LN → (windowed) attention (+q-pool) → residual → MLP
    (sam2.py:1049-1131), entirely on window-major tokens."""

    dim: int
    dim_out: int
    num_heads: int
    mlp_ratio: float = 4.0
    q_stride: Optional[Tuple[int, int]] = None
    window_side: int = 0  # 0 = global
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    head_pad: int = 0
    quant: bool = False  # W8A8 int8 dense layers (see quant.W8A8Dense)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [N, S, C]
        hidden = int(self.dim_out * self.mlp_ratio)
        if (
            self.quant
            and self.q_stride is None
            and self.dim == self.dim_out
            and 0 < self.window_side ** 2 <= 512
            and x.shape[1] == self.window_side ** 2
        ):
            # W8A8 whole-block kernel (same fused structure as the bf16
            # path below; int8 weights + per-row activation quantize)
            from ..param_holders import QuantAttnPairParams as _QAttnP
            from ..param_holders import QuantDenseParams as _QDenseP

            hd = self.dim_out // self.num_heads
            hp = self.head_pad or hd
            ln1 = _LNP(self.dim, self.param_dtype, name="norm1")()
            wq, sq, bq, wp, sp, bp = _QAttnP(
                self.dim, 3 * self.num_heads * hp, self.num_heads * hp,
                self.dtype, name="attn",
            )()
            ln2 = _LNP(self.dim, self.param_dtype, name="norm2")()
            w1, s1, b1 = _QDenseP(
                self.dim, hidden, self.dtype, name="mlp_layers_0"
            )()
            w2, s2, b2 = _QDenseP(
                hidden, self.dim, self.dtype, name="mlp_layers_1"
            )()
            from ...ops.hiera_block import fused_block_w8a8

            return fused_block_w8a8(
                x.astype(self.dtype),
                (*ln1, wq, sq, bq, wp, sp, bp, *ln2, w1, s1, b1, w2, s2, b2),
                self.num_heads, hd, self.head_pad,
                act=_hiera_act(),
            )
        if (
            not self.quant
            and self.q_stride is None
            and self.dim == self.dim_out
            and 0 < self.window_side ** 2 <= 512
            and x.shape[1] == self.window_side ** 2
        ):
            # whole-block fused kernel: one HBM round-trip for the
            # activations, weights resident in VMEM (ops/hiera_block.py)
            hd = self.dim_out // self.num_heads
            hp = self.head_pad or hd
            ln1_s, ln1_b = _LNP(self.dim, self.param_dtype, name="norm1")()
            wq, bq, wp, bp = _AttnP(
                self.dim, 3 * self.num_heads * hp, self.num_heads * hp,
                self.param_dtype, name="attn",
            )()
            ln2_s, ln2_b = _LNP(self.dim, self.param_dtype, name="norm2")()
            w1, b1 = _DenseP(
                self.dim, hidden, self.param_dtype, name="mlp_layers_0"
            )()
            w2, b2 = _DenseP(
                hidden, self.dim, self.param_dtype, name="mlp_layers_1"
            )()
            return fused_hiera_block(
                x.astype(self.dtype),
                (ln1_s, ln1_b, wq, bq, wp, bp, ln2_s, ln2_b, w1, b1, w2, b2),
                self.num_heads, hd, self.head_pad,
                act=_hiera_act(),
                align_qkv=True,  # 42.0 -> 47.8 f/s for Hiera-L (PERF.md r3)
            )

        import os as _os_gate

        # UFVIDEO_SAM2_INT8_SPECIAL=0 sends the quant trunk's 6 special
        # blocks back to the generic (unfused) W8A8Dense path below — the
        # A/B lever for the fused-special routing's net effect on the
        # full-trunk number (round-5 sweep measured 61.06 -> 49.29 f/s
        # after the routing landed; see PERF.md)
        _int8_special = _os_gate.environ.get(
            "UFVIDEO_SAM2_INT8_SPECIAL", "1"
        ) == "1"
        if (self.q_stride is not None or self.window_side == 0) and (
            not self.quant or _int8_special
        ):
            # q-pooling / global blocks (6 of Hiera-L's 48): the attention
            # stays in XLA / the flash kernel, but the LN1→qkv(+shortcut
            # proj) front and the proj→residual→LN2→MLP tail run as single
            # fused passes (ops/hiera_block.py fused_ln_matmul /
            # fused_block_tail, or their _w8a8 variants in int8 mode) —
            # 7 HBM round-trips become 3
            hd = self.dim_out // self.num_heads
            hp = self.head_pad or hd
            hw = self.num_heads * hp
            scale = hd ** -0.5
            ln1_s, ln1_b = _LNP(self.dim, self.param_dtype, name="norm1")()
            ln2_s, ln2_b = _LNP(self.dim_out, self.param_dtype, name="norm2")()
            sfront = qs = ps = s1 = s2 = None
            if self.quant:
                from ..param_holders import QuantAttnPairParams as _QAttnP
                from ..param_holders import QuantDenseParams as _QDenseP
                from ...ops.hiera_block import (
                    fused_block_tail_w8a8,
                    fused_ln_matmul_w8a8,
                    fused_qpool_block_w8a8,
                )

                wq, qs, bq, wp, ps, bp = _QAttnP(
                    self.dim, 3 * hw, hw, self.dtype,
                    proj_out=self.dim_out, name="attn",
                )()
                w1, s1, b1 = _QDenseP(
                    self.dim_out, hidden, self.dtype, name="mlp_layers_0"
                )()
                w2, s2, b2 = _QDenseP(
                    hidden, self.dim_out, self.dtype, name="mlp_layers_1"
                )()
                wfront, sfront, bfront = wq, qs, bq
                if self.dim != self.dim_out:
                    # the dim-change shortcut projection reads the same LN1
                    # output — fold it into the front matmul's columns
                    # (weight scales are per-output-column, so int8 blocks
                    # concatenate exactly)
                    wsc, ssc, bsc = _QDenseP(
                        self.dim, self.dim_out, self.dtype, name="proj"
                    )()
                    wfront = jnp.concatenate([wq, wsc], axis=1)
                    sfront = jnp.concatenate([qs, ssc])
                    bfront = jnp.concatenate([bq, bsc])
            else:
                wq, bq, wp, bp = _AttnP(
                    self.dim, 3 * hw, hw, self.param_dtype,
                    proj_out=self.dim_out, name="attn",
                )()
                w1, b1 = _DenseP(
                    self.dim_out, hidden, self.param_dtype,
                    name="mlp_layers_0"
                )()
                w2, b2 = _DenseP(
                    hidden, self.dim_out, self.param_dtype,
                    name="mlp_layers_1"
                )()
                wfront, bfront = wq, bq
                if self.dim != self.dim_out:
                    # the dim-change shortcut projection reads the same LN1
                    # output — fold it into the front matmul's output columns
                    wsc, bsc = _DenseP(
                        self.dim, self.dim_out, self.param_dtype, name="proj"
                    )()
                    wfront = jnp.concatenate(
                        [wq.astype(self.dtype), wsc.astype(self.dtype)],
                        axis=1,
                    )
                    bfront = jnp.concatenate([bq, bsc])

            import os as _os

            if (
                self.q_stride is not None
                and self.dim != self.dim_out
                and x.shape[1] == self.window_side ** 2
                and _os.environ.get("UFVIDEO_QPOOL_FUSED", "1") == "1"
            ):
                # whole-block fused q-pool kernel: computes only the pooled
                # sq = S/(sy·sx) q rows (ops/hiera_block.fused_qpool_block)
                if self.quant:
                    return fused_qpool_block_w8a8(
                        x.astype(self.dtype),
                        (ln1_s, ln1_b, wfront, sfront, bfront, wp, ps, bp,
                         ln2_s, ln2_b, w1, s1, b1, w2, s2, b2),
                        self.num_heads, hd, self.head_pad, self.q_stride,
                        act=_hiera_act(),
                    )
                return fused_qpool_block(
                    x.astype(self.dtype),
                    (ln1_s, ln1_b, wfront, bfront, wp, bp, ln2_s, ln2_b,
                     w1, b1, w2, b2),
                    self.num_heads, hd, self.head_pad, self.q_stride,
                    act=_hiera_act(),
                )

            if self.quant:
                front = fused_ln_matmul_w8a8(
                    x.astype(self.dtype), ln1_s, ln1_b, wfront, sfront,
                    bfront,
                )
            else:
                front = fused_ln_matmul(
                    x.astype(self.dtype), ln1_s, ln1_b, wfront, bfront
                )
            qkv = front[..., : 3 * hw]
            n, s, _ = qkv.shape

            shortcut = x.astype(self.dtype)
            if self.q_stride is not None:
                sy, sx = self.q_stride
                ws = self.window_side
                sq = (ws // sy) * (ws // sx)
                if self.dim != self.dim_out:
                    sc = front[..., 3 * hw :].reshape(n, ws, ws, self.dim_out)
                else:
                    sc = shortcut.reshape(n, ws, ws, self.dim)
                shortcut = nn.max_pool(
                    sc, window_shape=(sy, sx), strides=(sy, sx)
                ).reshape(n, sq, self.dim_out)
                q = qkv[..., :hw].reshape(n, ws, ws, hw)
                q = nn.max_pool(q, window_shape=(sy, sx), strides=(sy, sx))
                q = q.reshape(n, sq, self.num_heads, hp)
                k = qkv[..., hw : 2 * hw].reshape(n, s, self.num_heads, hp)
                v = qkv[..., 2 * hw :].reshape(n, s, self.num_heads, hp)
                o = window_dense_attention(q, k, v, scale=scale)
                o = o.reshape(n, sq, hw)
            else:  # global block
                if self.dim != self.dim_out:
                    shortcut = front[..., 3 * hw :]
                parts = qkv.reshape(n, s, 3, self.num_heads, hp)
                q_, k_, v_ = parts[:, :, 0], parts[:, :, 1], parts[:, :, 2]
                pad_d = 0
                if (
                    hp % 128 != 0
                    and _os.environ.get("UFVIDEO_GLOBAL_PAD_HEADS", "0")
                    == "1"
                ):
                    # zero-pad head_dim to a full 128-lane tile: the flash
                    # kernel's score/pv dots run at full MXU lane density
                    # (d=72 contracts at 56% otherwise); zero lanes are
                    # inert and sliced off the output
                    pad_d = 128 - hp % 128
                    padw = ((0, 0), (0, 0), (0, 0), (0, pad_d))
                    q_ = jnp.pad(q_, padw)
                    k_ = jnp.pad(k_, padw)
                    v_ = jnp.pad(v_, padw)
                o = attention(q_, k_, v_, scale=scale)
                if pad_d:
                    o = o[..., :hp]
                o = o.reshape(n, s, hw)
            if self.quant:
                return fused_block_tail_w8a8(
                    shortcut, o,
                    (wp, ps, bp, ln2_s, ln2_b, w1, s1, b1, w2, s2, b2),
                    act=_hiera_act(),
                )
            return fused_block_tail(
                shortcut, o, (wp, bp, ln2_s, ln2_b, w1, b1, w2, b2),
                act=_hiera_act(),
            )

        ln = lambda name: nn.LayerNorm(
            epsilon=1e-6, dtype=jnp.float32, param_dtype=self.param_dtype,
            name=name,
        )
        if self.quant:
            from ...quant import W8A8Dense

            dense = lambda feats, name: W8A8Dense(
                feats, dtype=self.dtype, name=name
            )
        else:
            dense = lambda feats, name: nn.Dense(
                feats, dtype=self.dtype, param_dtype=self.param_dtype,
                name=name,
            )
        shortcut = x
        xn = ln("norm1")(x).astype(self.dtype)

        if self.dim != self.dim_out:
            proj = dense(self.dim_out, "proj")(xn)
            if self.q_stride is not None:
                sy, sx = self.q_stride
                ws = self.window_side
                n = proj.shape[0]
                proj = proj.reshape(n, ws, ws, self.dim_out)
                proj = nn.max_pool(
                    proj, window_shape=(sy, sx), strides=(sy, sx)
                )
                proj = proj.reshape(n, (ws // sy) * (ws // sx), self.dim_out)
            shortcut = proj

        att = MultiScaleAttention(
            self.dim_out, self.num_heads, self.window_side, self.q_stride,
            self.dtype, self.param_dtype, self.head_pad, self.quant,
            name="attn",
        )(xn)

        x = shortcut + att
        xn = ln("norm2")(x).astype(self.dtype)
        m = dense(hidden, "mlp_layers_0")(xn)
        m = nn.gelu(m, approximate=False)
        m = dense(self.dim_out, "mlp_layers_1")(m)
        return x + m


class _FusedBlockParams(nn.Module):
    """Declares ONE MultiScaleBlock's params (identical tree/names to the
    module path) and returns the 12-tuple the fused kernels consume — used
    by the multi-block stage-fusion path so checkpoints stay bit-identical
    whether or not blocks are grouped."""

    dim: int
    num_heads: int
    mlp_ratio: float
    head_pad: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        hd = self.dim // self.num_heads
        hp = self.head_pad or hd
        hidden = int(self.dim * self.mlp_ratio)
        ln1_s, ln1_b = _LNP(self.dim, self.param_dtype, name="norm1")()
        wq, bq, wp, bp = _AttnP(
            self.dim, 3 * self.num_heads * hp, self.num_heads * hp,
            self.param_dtype, name="attn",
        )()
        ln2_s, ln2_b = _LNP(self.dim, self.param_dtype, name="norm2")()
        w1, b1 = _DenseP(
            self.dim, hidden, self.param_dtype, name="mlp_layers_0"
        )()
        w2, b2 = _DenseP(
            hidden, self.dim, self.param_dtype, name="mlp_layers_1"
        )()
        return (ln1_s, ln1_b, wq, bq, wp, bp, ln2_s, ln2_b, w1, b1, w2, b2)


class Hiera(nn.Module):
    """Multi-stage trunk returning per-stage NHWC feature maps
    (sam2.py:1134-1258)."""

    cfg: SAM2HieraConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # W8A8 int8 trunk (params from quant.quantize_vision_params): every
    # block's dense projections run s8×s8→s32; attention stays bf16
    quant: bool = False

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
        # torch-exact bicubic (Keys a=-0.75): jax.image.resize's cubic
        # kernel (a=-0.5) deviates by up to ~0.2 on unit-std inputs, a
        # systematic perturbation ahead of block 0 (ops/interp.py)
        from ...ops.interp import bicubic_matrix

        mh = jnp.asarray(bicubic_matrix(bg.shape[0], h))
        mw = jnp.asarray(bicubic_matrix(bg.shape[1], w))
        bg_r = jnp.einsum(
            "hy,yxc,wx->hwc", mh, bg.astype(jnp.float32), mw
        )
        tiles = (h // win.shape[0], w // win.shape[1], 1)
        pos = bg_r + jnp.tile(win.astype(jnp.float32), tiles)
        x = x + pos[None].astype(x.dtype)

        stages = cfg.stages
        depth = sum(stages)
        stage_ends = [sum(stages[: i + 1]) - 1 for i in range(len(stages))]
        q_pool_blocks = [e + 1 for e in stage_ends[:-1]]

        # per-block static metadata prepass (mirrors the loop state below):
        # (dim_in, dim_out, num_heads, pool, window_size)
        import os

        metas = []
        _ed, _nh, _cs = cfg.embed_dim, cfg.num_heads, 1
        for i in range(depth):
            _do = _ed
            _wsz = cfg.window_spec[_cs - 1]
            if i in cfg.global_att_blocks:
                _wsz = 0
            if i - 1 in stage_ends:
                _do = int(_ed * cfg.dim_mul)
                _nh = int(_nh * cfg.head_mul)
                _cs += 1
            metas.append((_ed, _do, _nh, cfg.q_stride if i in q_pool_blocks
                          else None, _wsz))
            _ed = _do

        def _stage_fusable(m):
            din, dout, nh_, pool_, wsz_ = m
            return (
                pool_ is None and din == dout and 0 < wsz_ ** 2 <= 512
            )

        # stage fusion: carry each grid step's rows through up to
        # UFVIDEO_HIERA_STAGE_NB consecutive identical-shape windowed blocks
        # inside one Pallas call (ops/hiera_block.fused_hiera_stage)
        stage_nb = int(os.environ.get("UFVIDEO_HIERA_STAGE_NB", "1"))

        outputs: List[jnp.ndarray] = []
        embed_dim, num_heads, cur_stage = cfg.embed_dim, cfg.num_heads, 1
        # token layout state: ``tokens`` is [B*nW, side², C] window-major
        # (None = only spatial ``x`` is current); ``pad_hw`` tracks window
        # padding of the layout
        tokens: Optional[jnp.ndarray] = None
        side = 0
        pad_hw = (h, w)
        i = 0
        while i < depth:
            dim_out = embed_dim
            window_size = cfg.window_spec[cur_stage - 1]
            if i in cfg.global_att_blocks:
                window_size = 0
            if i - 1 in stage_ends:
                dim_out = int(embed_dim * cfg.dim_mul)
                num_heads = int(num_heads * cfg.head_mul)
                cur_stage += 1

            pool = cfg.q_stride if i in q_pool_blocks else None
            if window_size > 0 and side != window_size:
                # relayout to this block's window side (stage entries and
                # post-pool rewindows only — same-side blocks are free)
                if tokens is not None:
                    x = from_windows(tokens, side, pad_hw, (h, w))
                tokens, pad_hw = to_windows(x, window_size)
                side = window_size
            elif window_size == 0:
                if tokens is None:
                    tokens, pad_hw = to_windows(x, 1)
                    side = 1
                assert pad_hw == (h, w), (
                    "global attention requires an unpadded token grid"
                )

            if (
                stage_nb > 1
                and not self.quant
                and _stage_fusable(metas[i])
                and window_size == side
                and tokens is not None
                and tokens.shape[1] == side * side
            ):
                # group up to stage_nb identical consecutive fusable blocks,
                # bounded by a per-call unrolled-attention-dot budget (~96
                # q/k dot pairs): Hiera-L stage-4 singles already sit at 64
                # pairs and a fused pair blew past a 25-min Mosaic compile.
                # A run can never span a stage boundary or a global block:
                # the next stage's entry block has q-pooling + a dim change
                # and global blocks have window_size 0, so metas differ.
                from ...ops.hiera_block import _pick_bw

                bw_, gw_ = _pick_bw(tokens.shape[0], side * side, num_heads)
                pairs = (bw_ // gw_) * num_heads
                nb_cap = max(1, 96 // max(pairs, 1))
                js = [i]
                while (
                    len(js) < min(stage_nb, nb_cap)
                    and js[-1] + 1 < depth
                    and metas[js[-1] + 1] == metas[i]
                ):
                    js.append(js[-1] + 1)
                if len(js) > 1:
                    plist = tuple(
                        _FusedBlockParams(
                            dim=embed_dim, num_heads=num_heads,
                            mlp_ratio=cfg.mlp_ratio, head_pad=cfg.head_pad,
                            param_dtype=self.param_dtype, name=f"blocks_{j}",
                        )()
                        for j in js
                    )
                    hd = embed_dim // num_heads
                    tokens = fused_hiera_stage(
                        tokens.astype(self.dtype), plist, num_heads, hd,
                        cfg.head_pad, False, _hiera_act(), 1e-6, True,
                    )
                    if js[-1] in stage_ends:
                        x = from_windows(tokens, side, pad_hw, (h, w))
                        outputs.append(x)
                    i = js[-1] + 1
                    continue

            blk_in = tokens
            if window_size == 0:
                # permutation-invariant: window-major order is fine; the
                # [B*nW, s², C] → [B, T, C] reshape is free
                blk_in = tokens.reshape(b, h * w, -1)

            out = MultiScaleBlock(
                dim=embed_dim,
                dim_out=dim_out,
                num_heads=num_heads,
                mlp_ratio=cfg.mlp_ratio,
                q_stride=pool,
                window_side=side if window_size > 0 else 0,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                head_pad=cfg.head_pad,
                quant=self.quant,
                name=f"blocks_{i}",
            )(blk_in)

            if window_size == 0:
                tokens = out.reshape(tokens.shape[0], side * side, -1)
            else:
                tokens = out
            if pool is not None:
                h, w = h // pool[0], w // pool[1]
                pad_hw = (pad_hw[0] // pool[0], pad_hw[1] // pool[1])
                side = max(side // pool[0], 1)
            embed_dim = dim_out

            if i in stage_ends:
                x = from_windows(tokens, side, pad_hw, (h, w))
                outputs.append(x)
            i += 1
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
