"""Shared SAM2 building blocks (NHWC, functional flax).

Re-implements the reference's generic modules (reference: sam2.py): channel
LayerNorm (:2330-2345 LayerNorm2d), the SAM MLP (:2297-2327), the projection
attention with optional internal downsample / kv_in_dim (:1430-1496), sine and
random-Fourier position embeddings (:1732-1886), and the 1-D sine temporal
embedding (:2297 get_1d_sine_pe).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.attention import attention

NO_OBJ_SCORE = -1024.0


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel (last in NHWC) dim — the reference's
    LayerNorm2d on NCHW (sam2.py:2330-2345)."""

    eps: float = 1e-6
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        w = self.param("scale", nn.initializers.ones, (dim,), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (dim,), self.param_dtype)
        xf = x.astype(jnp.float32)
        u = jnp.mean(xf, axis=-1, keepdims=True)
        s = jnp.mean((xf - u) ** 2, axis=-1, keepdims=True)
        out = (xf - u) * jax.lax.rsqrt(s + self.eps)
        return (out * w + b).astype(x.dtype)


class SamMLP(nn.Module):
    """MLP with ReLU between layers (sam2.py:2297-2327)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False
    activation: str = "relu"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = {"relu": nn.relu, "gelu": nn.gelu}[self.activation]
        x = x.astype(self.dtype)
        for i in range(self.num_layers):
            feats = (
                self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            )
            x = nn.Dense(
                feats, dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layers_{i}",
            )(x)
            if i < self.num_layers - 1:
                x = act(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


class ProjAttention(nn.Module):
    """q/k/v/out projection attention with optional internal downsample and a
    separate kv input width (sam2.py:1430-1496 Attention)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    kv_in_dim: Optional[int] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        internal = self.embedding_dim // self.downsample_rate
        hd = internal // self.num_heads
        dense = lambda feats, name: nn.Dense(
            feats, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        b, nq, _ = q.shape
        nk = k.shape[1]
        qp = dense(internal, "q_proj")(q).reshape(b, nq, self.num_heads, hd)
        kp = dense(internal, "k_proj")(k).reshape(b, nk, self.num_heads, hd)
        vp = dense(internal, "v_proj")(v).reshape(b, nk, self.num_heads, hd)
        o = attention(qp, kp, vp)
        return dense(self.embedding_dim, "out_proj")(o.reshape(b, nq, internal))


def position_embedding_sine(
    h: int, w: int, num_pos_feats: int = 256, temperature: float = 10000.0
) -> jnp.ndarray:
    """Normalized 2-D sine embedding [h, w, num_pos_feats]
    (sam2.py:1732-1830 PositionEmbeddingSine.forward, normalize=True)."""
    half = num_pos_feats // 2
    scale = 2 * math.pi
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    y = y / (h + 1e-6) * scale
    x = x / (w + 1e-6) * scale
    y = jnp.broadcast_to(y, (h, w))
    x = jnp.broadcast_to(x, (h, w))

    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / half)

    def enc(e):
        p = e[..., None] / dim_t  # [h, w, half]
        return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], -1).reshape(
            h, w, half
        )

    return jnp.concatenate([enc(y), enc(x)], axis=-1)  # [h, w, feats]


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier point/grid embedding (sam2.py:1831-1886)."""

    num_pos_feats: int = 128
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coords: jnp.ndarray) -> jnp.ndarray:
        """coords normalized to [0,1], shape [..., 2] → [..., 2*feats]."""
        gauss = self.param(
            "positional_encoding_gaussian_matrix",
            nn.initializers.normal(1.0),
            (2, self.num_pos_feats),
            self.param_dtype,
        )
        c = 2.0 * coords.astype(jnp.float32) - 1.0
        c = c @ gauss.astype(jnp.float32)
        c = 2 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def grid(self, h: int, w: int) -> jnp.ndarray:
        """Dense grid embedding [h, w, 2*feats] (forward(size))."""
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(
            [jnp.broadcast_to(xs[None, :], (h, w)),
             jnp.broadcast_to(ys[:, None], (h, w))],
            axis=-1,
        )
        return self(grid)


def get_1d_sine_pe(pos: jnp.ndarray, dim: int, temperature: float = 10000.0):
    """1-D sine temporal embedding (sam2.py get_1d_sine_pe)."""
    pe_dim = dim // 2
    dim_t = jnp.arange(pe_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / pe_dim)
    pe = pos.astype(jnp.float32)[..., None] / dim_t
    return jnp.concatenate([jnp.sin(pe), jnp.cos(pe)], axis=-1)
