"""SAM2 perf round 2: isolate window-transpose, pos-embed, LN costs.

Variants (all B=8, 1024s, bf16; numerics intentionally wrong where noted):
  nowin       — window partition/unpartition as contiguous reshape (no
                transpose); isolates the 6D-transpose cost
  nowin_ident — nowin + identity attention (pure dense ceiling)
  nopos       — skip the bicubic pos-embed resize
"""
import sys, os, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from perf_sam2 import build, identity_attention  # noqa: F401
import ufvideo_tpu.models.sam2.hiera as hiera_mod
from bench import _timeit_device_loop

_REAL_RESIZE = jax.image.resize

FRAMES = 8


def fake_partition(x, ws):
    b, h, w, c = x.shape
    return x.reshape(-1, ws, ws, c), (h, w)


def fake_unpartition(windows, ws, pad_hw, hw):
    h, w = hw
    return windows.reshape(-1, h, w, windows.shape[-1])


def run(variant):
    saved = (hiera_mod.window_partition, hiera_mod.window_unpartition,
             hiera_mod.attention, hiera_mod.jax.image.resize)
    try:
        if variant.startswith("nowin"):
            hiera_mod.window_partition = fake_partition
            hiera_mod.window_unpartition = fake_unpartition
        if variant.endswith("ident"):
            hiera_mod.attention = identity_attention
        if variant == "nopos":
            # kill only the bicubic pos-embed resize; FPN nearest stays real
            hiera_mod.jax.image.resize = (
                lambda img, shape, method=None:
                _REAL_RESIZE(img, shape, method=method)
                if method == "nearest" else jnp.zeros(shape, img.dtype)
            )
        step, params, x = build()
        dt = _timeit_device_loop(step, params, x, iters=4)
    finally:
        (hiera_mod.window_partition, hiera_mod.window_unpartition,
         hiera_mod.attention, hiera_mod.jax.image.resize) = saved
    print(json.dumps({"variant": variant, "ms_per_batch8": round(dt * 1e3, 2),
                      "frames_per_sec": round(FRAMES / dt, 2)}), flush=True)


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["nowin", "nowin_ident", "nopos"]):
        run(v)
