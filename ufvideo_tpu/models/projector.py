"""Spatio-temporal vision-language connector, TPU-native (NHWC/NDHWC).

Re-implements the reference's projector family (reference:
ufvideo/model/projector.py:95-250): ``linear``, ``mlpNx_gelu``,
``stc_connector`` / ``stc_connector_v35`` (default, train.py:81),
``stp_connector``, ``spatial_conv``, ``spatial_pool``.

The STC connector is RegStage(depth=4) → Conv3d (t,h,w)=(2,2,2) downsample →
RegStage(depth=4) → 2-layer MLP readout (projector.py:133-215); the v35
variant uses padding=0 in the Conv3d (projector.py:225-238). The RegStage
block replicates timm 1.0.15's ``regnet.Bottleneck`` as instantiated there
(depth-wise 3x3 via group_size=1, SE with rd=in_chs/4, LayerNorm2d, SiLU,
conv1x1+LN shortcut on channel change) so trained torch weights translate
1:1. All convs run in NHWC / NDHWC — the TPU-native layout.
"""

from __future__ import annotations

import re
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..configs import ProjectorConfig


class RegBottleneck(nn.Module):
    """timm regnet.Bottleneck as used by the reference's RegStage
    (projector.py:153-161): bottle_ratio=1, group_size=1 (depthwise 3x3),
    se_ratio=0.25 of *input* channels, LayerNorm over channels, SiLU."""

    in_chs: int
    out_chs: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [N, H, W, C]
        conv = lambda feats, k, groups, name: nn.Conv(
            feats, kernel_size=(k, k), strides=(1, 1), padding="SAME",
            feature_group_count=groups, use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        ln = lambda name: nn.LayerNorm(
            epsilon=1e-6, dtype=jnp.float32, param_dtype=self.param_dtype,
            name=name,
        )

        shortcut = x
        h = nn.silu(ln("conv1_ln")(conv(self.out_chs, 1, 1, "conv1")(x)).astype(self.dtype))
        h = nn.silu(ln("conv2_ln")(conv(self.out_chs, 3, self.out_chs, "conv2")(h)).astype(self.dtype))

        # squeeze-excite: rd channels = round(in_chs * 0.25)
        rd = int(round(self.in_chs * 0.25))
        se = jnp.mean(h, axis=(1, 2), keepdims=True)
        se = nn.Conv(
            rd, (1, 1), use_bias=True, dtype=self.dtype,
            param_dtype=self.param_dtype, name="se_fc1",
        )(se)
        se = nn.silu(se)
        se = nn.Conv(
            self.out_chs, (1, 1), use_bias=True, dtype=self.dtype,
            param_dtype=self.param_dtype, name="se_fc2",
        )(se)
        h = h * nn.sigmoid(se)

        h = ln("conv3_ln")(conv(self.out_chs, 1, 1, "conv3")(h)).astype(self.dtype)
        if self.in_chs != self.out_chs:
            shortcut = ln("downsample_ln")(
                conv(self.out_chs, 1, 1, "downsample")(shortcut)
            ).astype(self.dtype)
        return nn.silu(h + shortcut)


class RegStage(nn.Module):
    depth: int
    in_chs: int
    out_chs: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.depth):
            x = RegBottleneck(
                self.in_chs if i == 0 else self.out_chs,
                self.out_chs,
                self.dtype,
                self.param_dtype,
                name=f"b{i + 1}",  # timm names blocks b1..bN
            )(x)
        return x


class MLPReadout(nn.Module):
    depth: int
    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # torch builds Sequential(Linear, [GELU, Linear]*): indices 0,2,4...
        x = nn.Dense(
            self.features, dtype=self.dtype, param_dtype=self.param_dtype,
            name="fc0",
        )(x)
        for i in range(1, self.depth):
            x = nn.gelu(x, approximate=False)  # torch nn.GELU() default: EXACT erf
            x = nn.Dense(
                self.features, dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"fc{2 * i}",
            )(x)
        return x


class STCConnector(nn.Module):
    """Shared implementation of stc/stp/spatial variants.

    Input  [B, T, N, D_enc] (N = vis_grid² patch tokens per frame)
    Output [B, T'·H'·W', D_llm]
    """

    cfg: ProjectorConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b, t, n, _ = x.shape
        hw = int(round(n ** 0.5))
        assert hw * hw == n, n
        depth = 0 if cfg.projector_type in ("spatial_conv", "spatial_pool") else cfg.depth
        dt, dh, dw = cfg.downsample
        if cfg.projector_type in ("spatial_conv", "spatial_pool"):
            dt = 1

        x = x.reshape(b * t, hw, hw, x.shape[-1]).astype(self.dtype)
        if depth:
            x = RegStage(
                depth, cfg.encoder_hidden_size, cfg.hidden_size,
                self.dtype, self.param_dtype, name="s1",
            )(x)
        x = x.reshape(b, t, hw, hw, x.shape[-1])

        if cfg.projector_type in ("stp_connector", "spatial_pool"):
            x = nn.avg_pool(
                x, window_shape=(dt, dh, dw), strides=(dt, dh, dw)
            )
            x = nn.silu(x)
        else:
            pad = 1 if cfg.projector_type in ("stc_connector", "spatial_conv") else 0
            x = nn.Conv(
                cfg.hidden_size,
                kernel_size=(dt, dh, dw),
                strides=(dt, dh, dw),
                padding=((pad, pad), (pad, pad), (pad, pad)),
                use_bias=True,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="sampler",
            )(x)
            x = nn.silu(x)

        bt, nt, nh, nw, c = x.shape
        x = x.reshape(b * nt, nh, nw, c)
        if depth:
            x = RegStage(
                depth, cfg.hidden_size, cfg.hidden_size,
                self.dtype, self.param_dtype, name="s2",
            )(x)
        x = x.reshape(b, nt * nh * nw, x.shape[-1])
        return MLPReadout(
            cfg.mlp_depth, cfg.hidden_size, self.dtype, self.param_dtype,
            name="readout",
        )(x)


class LinearProjector(nn.Module):
    """'linear' / 'mlpNx_gelu': frame features are mean-pooled over time by
    the temporal aggregator before projection (videorefer_arch.py:202-203)."""

    cfg: ProjectorConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, N, D]
        x = jnp.mean(x.astype(self.dtype), axis=1)  # [B, N, D]
        m = re.match(r"^mlp(\d+)x_gelu$", self.cfg.projector_type)
        depth = int(m.group(1)) if m else 1
        x = nn.Dense(
            self.cfg.hidden_size, dtype=self.dtype,
            param_dtype=self.param_dtype, name="fc0",
        )(x)
        for i in range(1, depth):
            x = nn.gelu(x, approximate=False)  # torch nn.GELU() default: EXACT erf
            x = nn.Dense(
                self.cfg.hidden_size, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"fc{2 * i}",
            )(x)
        return x


def build_projector(
    cfg: ProjectorConfig, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16
) -> nn.Module:
    """Factory mirroring the reference's build_vision_projector
    (projector.py:95-122)."""
    t = cfg.projector_type
    if t == "linear" or re.match(r"^mlp(\d+)x_gelu$", t):
        return LinearProjector(cfg, dtype, param_dtype)
    if t in (
        "stc_connector", "stc_connector_v35", "stp_connector",
        "spatial_conv", "spatial_pool",
    ):
        return STCConnector(cfg, dtype, param_dtype)
    raise ValueError(f"Unknown projector type: {t}")
