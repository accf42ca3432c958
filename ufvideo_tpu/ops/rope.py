"""Rotary position embeddings.

Two flavors are needed:
  - 1-D RoPE for the Qwen2 LLM (half-split layout, matching HF Qwen2).
  - 2-D axial RoPE for SAM2 memory attention (reference: sam2.py:1498-1562
    RoPEAttention with `compute_axial_cis`), including the
    ``num_k_exclude_rope`` behavior where trailing object-pointer tokens on k
    skip rotation (sam2.py:1541-1547).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def rope_freqs(head_dim: int, theta: float) -> jnp.ndarray:
    """Inverse frequencies, shape [head_dim // 2], float32."""
    exponent = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta ** exponent)


def rope_cos_sin(
    positions: jnp.ndarray, head_dim: int, theta: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for integer positions; each [..., head_dim // 2]."""
    freqs = rope_freqs(head_dim, theta)
    angles = positions.astype(jnp.float32)[..., None] * freqs
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Half-split RoPE (HF Qwen2 layout: rotate_half).

    x: [..., seq, num_heads, head_dim]; cos/sin: [..., seq, head_dim//2].
    """
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    cos = cos[..., :, None, :]
    sin = sin[..., :, None, :]
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )
    return out.astype(orig_dtype)


def apply_rope_interleaved(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Interleaved (complex-pair) RoPE as used by SAM2's axial RoPE
    (sam2.py:1460-1496 apply_rotary_enc uses complex multiply over
    adjacent pairs). x: [..., seq, heads, head_dim]; cos/sin broadcastable
    to [..., seq, 1, head_dim//2]."""
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    xr = x[..., 0::2]
    xi = x[..., 1::2]
    or_ = xr * cos - xi * sin
    oi_ = xr * sin + xi * cos
    out = jnp.stack([or_, oi_], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def axial_rope_cos_sin(
    head_dim: int, h: int, w: int, theta: float = 10000.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2-D axial RoPE tables for an h*w token grid (SAM2 memory attention,
    sam2.py:1427-1457 compute_axial_cis): first half of the pair dims encode
    the y coordinate, second half the x coordinate.

    Returns cos/sin of shape [h*w, head_dim // 2].
    """
    quarter = head_dim // 4
    freqs = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 4, dtype=jnp.float32)[:quarter] / head_dim)
    )
    # token order is row-major: t_x = t % w, t_y = t // w (sam2.py:1888-1893)
    t = jnp.arange(h * w, dtype=jnp.float32)
    grid_x = t % w
    grid_y = jnp.floor(t / w)
    ang_x = grid_x[:, None] * freqs  # [hw, quarter]
    ang_y = grid_y[:, None] * freqs  # [hw, quarter]
    # concat x-channels then y-channels over the complex dims
    # (sam2.py:1895-1904 compute_axial_cis)
    ang = jnp.concatenate([ang_x, ang_y], axis=-1)  # [hw, head_dim//2]
    return jnp.cos(ang), jnp.sin(ang)
