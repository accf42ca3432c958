"""SAM2 perf round 3: per-stage attribution.

Times (B=8, bf16):
  s1 / s12 / s123 / s1234 — Hiera trunk truncated after stage k
  mlpchain — 36x isolated stage-3-shaped dense chain (roofline check)
"""
import sys, os, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import _timeit_device_loop, _random_params
from ufvideo_tpu.configs import SAM2HieraConfig
from ufvideo_tpu.models.sam2.hiera import Hiera

FRAMES = 8
FULL = SAM2HieraConfig()


def trunk_time(n_stages):
    import dataclasses
    cfg = dataclasses.replace(
        FULL,
        stages=FULL.stages[:n_stages],
        window_spec=FULL.window_spec[:n_stages],
        global_att_blocks=tuple(
            b for b in FULL.global_att_blocks
            if b < sum(FULL.stages[:n_stages])
        ),
    )
    model = Hiera(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (FRAMES, cfg.image_size, cfg.image_size, 3),
                          jnp.bfloat16)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x)["params"])
    params = _random_params(shapes)

    def step(p, xx):
        return model.apply({"params": p}, xx)[-1]

    return _timeit_device_loop(step, params, x, iters=4)


def mlpchain_time():
    """36 stage-3-shaped blocks, dense ops only (LN + qkv + proj + MLP),
    no attention / windows: the XLA roofline for stage 3."""
    import flax.linen as nn

    D, T, DEPTH = 576, 4096, 36

    class Block(nn.Module):
        @nn.compact
        def __call__(self, x):
            ln = lambda n: nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=n)
            h = ln("n1")(x).astype(jnp.bfloat16)
            qkv = nn.Dense(3 * D, dtype=jnp.bfloat16, name="qkv")(h)
            o = qkv[..., :D]  # stand-in for attention output
            x = x + nn.Dense(D, dtype=jnp.bfloat16, name="proj")(o)
            h = ln("n2")(x).astype(jnp.bfloat16)
            m = nn.Dense(4 * D, dtype=jnp.bfloat16, name="up")(h)
            m = nn.gelu(m, approximate=False)
            return x + nn.Dense(D, dtype=jnp.bfloat16, name="down")(m)

    class Chain(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(DEPTH):
                x = Block(name=f"b{i}")(x)
            return x

    model = Chain()
    x = jax.random.normal(jax.random.PRNGKey(1), (FRAMES, T, D), jnp.bfloat16)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x)["params"])
    params = _random_params(shapes)

    def step(p, xx):
        return model.apply({"params": p}, xx)

    dt = _timeit_device_loop(step, params, x, iters=4)
    flops = FRAMES * T * DEPTH * 2 * (3 * D * D + D * D + 8 * D * D)
    print(json.dumps({"variant": "mlpchain", "ms": round(dt * 1e3, 2),
                      "tflops": round(flops / dt / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["mlpchain", "s1", "s12", "s123", "s1234"]):
        if v == "mlpchain":
            mlpchain_time()
        else:
            n = len(v) - 1
            dt = trunk_time(n)
            print(json.dumps({"variant": v, "ms_per_batch8": round(dt * 1e3, 2)}),
                  flush=True)
