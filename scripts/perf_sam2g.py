"""SAM2 perf round 6: where did the fused-kernel win go?

  kernelnoop — full model, fused path's pallas call replaced by a v-lane
               slice (isolates the kernel's own cost from the layout wins)
  kshape:*   — fused kernel alone at each stage's window shapes
"""
import sys, os, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from perf_sam2 import build
import ufvideo_tpu.models.sam2.hiera as hiera_mod
import ufvideo_tpu.ops.window_attention as wa
from bench import _timeit_device_loop

FRAMES = 8

# (NW, S, H) per windowed stage at B=8, 1024^2, Hiera-L
STAGE_SHAPES = {
    "s1": (8 * 1024, 64, 2),
    "s2": (8 * 4096, 16, 4),
    "s3": (8 * 16, 256, 8),
    "s4": (8 * 16, 64, 16),
}
HP = 128


def run_kernelnoop():
    orig = hiera_mod.fused_window_attention

    def noop(qkv, num_heads, head_dim, head_pad, interpret=False):
        return qkv[..., 2 * num_heads * head_pad:]

    hiera_mod.fused_window_attention = noop
    try:
        step, params, x = build()
        dt = _timeit_device_loop(step, params, x, iters=4)
    finally:
        hiera_mod.fused_window_attention = orig
    print(json.dumps({"variant": "kernelnoop",
                      "ms_per_batch8": round(dt * 1e3, 2)}), flush=True)


def run_kernel_shape(name):
    nw, s, h = STAGE_SHAPES[name]
    qkv = jax.random.normal(jax.random.PRNGKey(0), (nw, s, 3 * h * HP),
                            jnp.bfloat16)

    def step(p, x):
        return wa.fused_window_attention(x, h, 72, HP)

    dt = _timeit_device_loop(step, {}, qkv, iters=8)
    print(json.dumps({"variant": f"kshape:{name}",
                      "ms": round(dt * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["kernelnoop", "s1", "s2", "s3", "s4"]):
        if v == "kernelnoop":
            run_kernelnoop()
        else:
            run_kernel_shape(v)
