"""Fused on-device frame preprocessing.

The reference preprocesses frames on the host with PIL/torchvision
(reference: mm_utils.py:161-295 process_video → HF processor;
:452-478 SAM resize+normalize) and ships float32 tensors to the device. Here
raw uint8 frames are shipped (4x less host→device traffic — the usual
bottleneck per SURVEY §7 hard-part 5) and resize → normalize run fused under
jit on device; patchify is already a device matmul inside the vision tower.

XLA fuses the elementwise chain into the resize gather; a Pallas kernel adds
nothing here (bandwidth-bound, no reuse).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)
SAM_MEAN = (123.675, 116.28, 103.53)
SAM_STD = (58.395, 57.12, 57.375)


@functools.partial(
    jax.jit,
    static_argnames=("mean", "std", "size", "rescale", "method", "out_dtype"),
)
def resize_normalize(
    frames_u8: jnp.ndarray,  # [T, H, W, 3] uint8
    mean: Tuple[float, float, float],
    std: Tuple[float, float, float],
    *,
    size: int,
    rescale: bool,
    method: str = "bilinear",
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    t = frames_u8.shape[0]
    x = frames_u8.astype(jnp.float32)
    x = jax.image.resize(x, (t, size, size, 3), method=method)
    # match the host PIL path's uint8 quantization: bicubic overshoots at
    # high-contrast edges (values < 0 or > 255), while PIL clamps+rounds to
    # uint8 before normalization — without this the device and host
    # "parity" paths disagree exactly at mask-relevant edge pixels
    x = jnp.clip(jnp.round(x), 0.0, 255.0)
    if rescale:
        x = x / 255.0
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    return ((x - m) / s).astype(out_dtype)


def siglip_preprocess_device(frames_u8: jnp.ndarray, out_dtype=jnp.bfloat16):
    """uint8 [T, H, W, 3] → [T, 384, 384, 3] SigLIP-normalized, on device."""
    return resize_normalize(
        frames_u8, SIGLIP_MEAN, SIGLIP_STD, size=384, rescale=True,
        method="bicubic", out_dtype=out_dtype,
    )


def sam_preprocess_device(frames_u8: jnp.ndarray, out_dtype=jnp.bfloat16):
    """uint8 [T, H, W, 3] → [T, 1024, 1024, 3] SAM-normalized, on device."""
    return resize_normalize(
        frames_u8, SAM_MEAN, SAM_STD, size=1024, rescale=False,
        method="bicubic", out_dtype=out_dtype,
    )
