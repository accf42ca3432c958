"""Stage-2 (16-token window) kernel variants, standalone timings.

  masked:bw — current masked big-matmul at windows-per-block bw
  batched   — 3D batched dot (einsum bqd,bkd->bqk) per grid step
"""
import sys, os, json, functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from bench import _timeit_device_loop
import ufvideo_tpu.ops.window_attention as wa

NW, S, H, HP = 8 * 4096, 16, 4, 128
C = 3 * H * HP


def masked(bw):
    qkv = jax.random.normal(jax.random.PRNGKey(0), (NW, S, C), jnp.bfloat16)
    kernel = functools.partial(
        wa._kernel, num_heads=H, head_pad=HP, tokens=S, scale=72 ** -0.5,
        bw=bw)
    f = lambda p, x: pl.pallas_call(
        kernel, grid=(NW // bw,),
        in_specs=[pl.BlockSpec((bw, S, C), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((bw, S, H * HP), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NW, S, H * HP), x.dtype),
    )(x)
    dt = _timeit_device_loop(f, {}, qkv, iters=8)
    print(json.dumps({"variant": f"masked:{bw}", "ms": round(dt * 1e3, 3)}),
          flush=True)


def _batched_kernel(qkv_ref, o_ref, *, bw):
    x = qkv_ref[:]  # [bw, S, C]
    for h in range(H):
        q = x[:, :, h * HP:(h + 1) * HP]
        k = x[:, :, (H + h) * HP:(H + h + 1) * HP]
        v = x[:, :, (2 * H + h) * HP:(2 * H + h + 1) * HP]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * (72 ** -0.5)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(x.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, h * HP:(h + 1) * HP] = o.astype(o_ref.dtype)


def batched(bw):
    qkv = jax.random.normal(jax.random.PRNGKey(0), (NW, S, C), jnp.bfloat16)
    kernel = functools.partial(_batched_kernel, bw=bw)
    f = lambda p, x: pl.pallas_call(
        kernel, grid=(NW // bw,),
        in_specs=[pl.BlockSpec((bw, S, C), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((bw, S, H * HP), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NW, S, H * HP), x.dtype),
    )(x)
    dt = _timeit_device_loop(f, {}, qkv, iters=8)
    print(json.dumps({"variant": f"batched:{bw}", "ms": round(dt * 1e3, 3)}),
          flush=True)


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["masked:8", "masked:16", "batched:32",
                               "batched:128"]):
        kind, _, n = v.partition(":")
        try:
            (masked if kind == "masked" else batched)(int(n))
        except Exception as e:
            print(json.dumps({"variant": v, "error": str(e)[:200]}), flush=True)
