"""Flax parameter-holder modules that reproduce the exact param trees of
nn.Dense / nn.LayerNorm / an attention pair without computing anything —
so whole-block fused Pallas kernels (ops/hiera_block.py) can consume raw
weights while checkpoints stay bit-identical to the unfused module graph.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class DenseParams(nn.Module):
    """Same tree as nn.Dense: kernel [in, out] (lecun_normal), bias [out]."""

    in_dim: int
    out_dim: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_dim, self.out_dim), self.param_dtype,
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.out_dim,), self.param_dtype
        )
        return k, b


class LayerNormParams(nn.Module):
    """Same tree as nn.LayerNorm: scale (ones), bias (zeros)."""

    dim: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        s = self.param(
            "scale", nn.initializers.ones, (self.dim,), self.param_dtype
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.dim,), self.param_dtype
        )
        return s, b


class QuantDenseParams(nn.Module):
    """Same tree as quant.W8A8Dense: kernel_q int8 [in, out], kernel_scale
    f32 [out], bias [out] (bias dtype = the layer's compute dtype, matching
    W8A8Dense's declaration so fused and unfused int8 paths share params)."""

    in_dim: int
    out_dim: int
    bias_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self):
        q = self.param(
            "kernel_q", nn.initializers.zeros,
            (self.in_dim, self.out_dim), jnp.int8,
        )
        s = self.param(
            "kernel_scale", nn.initializers.ones, (self.out_dim,),
            jnp.float32,
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.out_dim,), self.bias_dtype
        )
        return q, s, b


class QuantAttnPairParams(nn.Module):
    """W8A8 analog of AttnPairParams: qkv + proj QuantDenseParams under one
    scope, same child names as the unfused quant attention modules."""

    dim: int
    qkv_out: int
    proj_in: int
    bias_dtype: Any = jnp.bfloat16
    qkv_name: str = "qkv"
    proj_name: str = "proj"
    proj_out: int = 0

    @nn.compact
    def __call__(self):
        wq, sq, bq = QuantDenseParams(
            self.dim, self.qkv_out, self.bias_dtype, name=self.qkv_name
        )()
        wp, sp, bp = QuantDenseParams(
            self.proj_in, self.proj_out or self.dim, self.bias_dtype,
            name=self.proj_name,
        )()
        return wq, sq, bq, wp, sp, bp


class AttnPairParams(nn.Module):
    """qkv + output-projection Dense pair under one scope (names are the
    child module names used by the unfused attention module)."""

    dim: int
    qkv_out: int
    proj_in: int
    param_dtype: Any = jnp.float32
    qkv_name: str = "qkv"
    proj_name: str = "proj"
    proj_out: int = 0  # 0 = dim (dim-changing blocks project to dim_out)

    @nn.compact
    def __call__(self):
        kq, bq = DenseParams(
            self.dim, self.qkv_out, self.param_dtype, name=self.qkv_name
        )()
        kp, bp = DenseParams(
            self.proj_in, self.proj_out or self.dim, self.param_dtype,
            name=self.proj_name,
        )()
        return kq, bq, kp, bp
