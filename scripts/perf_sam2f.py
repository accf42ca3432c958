"""SAM2 perf round 5: quantify the head-split (d=72 lane padding) cost.

  noheadsplit — real Hiera, MultiScaleAttention patched to keep the fused
                [.., C] layout end-to-end (v-passthrough, no [.., heads, 72]
                tensors ever materialized in HBM). Numerically wrong;
                isolates the relayout cost that remains even under the
                'ident' ablation (which still head-splits).
"""
import sys, os, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp

from perf_sam2 import build
import ufvideo_tpu.models.sam2.hiera as hiera_mod
from bench import _timeit_device_loop

FRAMES = 8


class NoHeadSplitAttention(hiera_mod.MultiScaleAttention):
    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        qkv = nn.Dense(
            self.dim_out * 3, dtype=self.dtype, param_dtype=self.param_dtype,
            name="qkv",
        )(x.reshape(b, h * w, -1))
        o = qkv[..., 2 * self.dim_out:]  # v third, fused layout
        if self.q_stride is not None:
            sy, sx = self.q_stride
            o = o.reshape(b, h, w, self.dim_out)
            o = nn.max_pool(o, window_shape=(sy, sx), strides=(sy, sx))
            h, w = o.shape[1], o.shape[2]
            o = o.reshape(b, h * w, self.dim_out)
        o = o.reshape(b, h, w, self.dim_out)
        return nn.Dense(
            self.dim_out, dtype=self.dtype, param_dtype=self.param_dtype,
            name="proj",
        )(o)


def run():
    orig = hiera_mod.MultiScaleAttention
    hiera_mod.MultiScaleAttention = NoHeadSplitAttention
    try:
        step, params, x = build()
        dt = _timeit_device_loop(step, params, x, iters=4)
    finally:
        hiera_mod.MultiScaleAttention = orig
    print(json.dumps({"variant": "noheadsplit",
                      "ms_per_batch8": round(dt * 1e3, 2),
                      "frames_per_sec": round(FRAMES / dt, 2)}), flush=True)


if __name__ == "__main__":
    run()
