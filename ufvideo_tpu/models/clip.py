"""CLIP vision tower (the reference's alternative to SigLIP).

Re-implements the HF CLIPVisionModel feature path used by the reference's
CLIPVisionTower (reference: encoder.py:12-93): class token + learned
positions + pre-layernorm transformer with quick-GELU, hidden-state tap at
``select_layer`` with CLS stripped for select_feature='patch'
(encoder.py:36-44).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import attention


@dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    select_layer: int = -2
    select_feature: str = "patch"

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_encode_layers(self) -> int:
        assert self.select_layer < 0
        return self.num_layers + 1 + self.select_layer


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPVisionConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, _):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
            param_dtype=self.param_dtype, name=name,
        )
        dense = lambda feats, name: nn.Dense(
            feats, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        b, s, _ = x.shape
        h = ln("layer_norm1")(x).astype(self.dtype)
        q = dense(cfg.hidden_size, "q_proj")(h).reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = dense(cfg.hidden_size, "k_proj")(h).reshape(b, s, cfg.num_heads, cfg.head_dim)
        v = dense(cfg.hidden_size, "v_proj")(h).reshape(b, s, cfg.num_heads, cfg.head_dim)
        o = attention(q, k, v).reshape(b, s, cfg.hidden_size)
        x = x + dense(cfg.hidden_size, "out_proj")(o)
        h = ln("layer_norm2")(x).astype(self.dtype)
        h = quick_gelu(dense(cfg.intermediate_size, "fc1")(h))
        x = x + dense(cfg.hidden_size, "fc2")(h)
        return x, None


class CLIPVisionTower(nn.Module):
    """Pixels NHWC → patch features at the hidden_states[select_layer] tap
    (CLS stripped)."""

    cfg: CLIPVisionConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b = pixels.shape[0]
        p, g = cfg.patch_size, cfg.grid_size
        kernel = self.param(
            "patch_embedding_kernel",
            nn.initializers.lecun_normal(),
            (p, p, 3, cfg.hidden_size),
            self.param_dtype,
        )
        px = pixels[:, : g * p, : g * p, :].astype(self.dtype)
        px = px.reshape(b, g, p, g, p, 3).transpose(0, 1, 3, 2, 4, 5)
        px = px.reshape(b, cfg.num_patches, p * p * 3)
        x = px @ kernel.astype(self.dtype).reshape(p * p * 3, cfg.hidden_size)

        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02),
            (cfg.hidden_size,), self.param_dtype,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size)), x],
            axis=1,
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (cfg.num_patches + 1, cfg.hidden_size), self.param_dtype,
        )
        x = x + pos[None].astype(self.dtype)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
            param_dtype=self.param_dtype, name="pre_layrnorm",
        )(x).astype(self.dtype)

        layers = nn.scan(
            CLIPEncoderLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.num_encode_layers,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )(cfg, self.dtype, self.param_dtype, name="layers")
        x, _ = layers(x, None)
        if cfg.select_feature == "patch":
            x = x[:, 1:]  # strip CLS (encoder.py:38-39)
        return x
