"""SAM2 Hiera encode perf ablations (run on the real chip, background).

Times forward_image variants at B=8, 1024², bf16:
  base      — current code
  ident     — attention -> identity (isolates total attention cost)
  fastattn  — small-window attention in bf16 with fused fp32 softmax
Usage: python scripts/perf_sam2.py [variant ...]
"""
import sys, os, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import _timeit_device_loop, _random_params
from ufvideo_tpu.configs import SAM2Config
from ufvideo_tpu.models.sam2 import SAM2
import ufvideo_tpu.models.sam2.hiera as hiera_mod

FRAMES = 8


def fast_small_attention(q, k, v, *, causal=False, kv_lens=None,
                         kv_mask=None, mask=None, scale=None, impl="auto"):
    b, sq, hq, d = q.shape
    hkv = k.shape[2]
    if sq >= 128:  # global blocks: keep the pallas flash path
        from ufvideo_tpu.ops.attention import attention as real
        return real(q, k, v, causal=causal, kv_lens=kv_lens, kv_mask=kv_mask,
                    mask=mask, scale=scale, impl=impl)
    assert hq == hkv and mask is None and kv_lens is None
    s = (d ** -0.5) if scale is None else scale
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * s
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v)
    return out


def identity_attention(q, k, v, **kw):
    if q.shape[1] >= 128:
        from ufvideo_tpu.ops.attention import attention as real
        return real(q, k, v, **kw)
    return v[:, : q.shape[1]].astype(q.dtype)  # q may be max-pooled


def build():
    cfg = SAM2Config()
    model = SAM2(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1024, 1024, 3), jnp.bfloat16)
    )["params"])
    params = _random_params(shapes)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (FRAMES, 1024, 1024, 3), jnp.bfloat16)

    def step(p, xx):
        out = model.apply({"params": p}, xx, method=type(model).forward_image)
        return out["backbone_fpn"][2]

    return step, params, x


def run(variant):
    orig = hiera_mod.attention
    if variant == "ident":
        hiera_mod.attention = identity_attention
    elif variant == "fastattn":
        hiera_mod.attention = fast_small_attention
    try:
        step, params, x = build()
        dt = _timeit_device_loop(step, params, x, iters=4)
    finally:
        hiera_mod.attention = orig
    print(json.dumps({"variant": variant, "ms_per_batch8": round(dt * 1e3, 2),
                      "frames_per_sec": round(FRAMES / dt, 2)}), flush=True)


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["base", "ident", "fastattn"]):
        run(v)
