"""SAM2 perf round 4: is the 4D NHWC activation layout the killer?

  mlp3d    — stage-3 dense chain on [8, 4096, 576]   (known: ~95ms)
  mlp4d    — same math on [8, 64, 64, 576]
  mlp4dwin — 4D + window partition/unpartition transposes per block
  patchpos — patch embed conv + pos embed only
"""
import sys, os, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp

from bench import _timeit_device_loop, _random_params
from ufvideo_tpu.models.sam2.hiera import window_partition, window_unpartition

FRAMES, D, G, DEPTH = 8, 576, 64, 36  # stage-3: 64x64 grid, dim 576
WS = 16


class Block(nn.Module):
    windows: bool = False

    @nn.compact
    def __call__(self, x):
        ln = lambda n: nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=n)
        h = ln("n1")(x).astype(jnp.bfloat16)
        if self.windows:
            h, pad_hw = window_partition(h, WS)
        qkv = nn.Dense(3 * D, dtype=jnp.bfloat16, name="qkv")(h)
        o = qkv[..., :D]
        if self.windows:
            o = window_unpartition(o, WS, pad_hw, (G, G))
        x = x + nn.Dense(D, dtype=jnp.bfloat16, name="proj")(o)
        h = ln("n2")(x).astype(jnp.bfloat16)
        m = nn.Dense(4 * D, dtype=jnp.bfloat16, name="up")(h)
        m = nn.gelu(m, approximate=False)
        return x + nn.Dense(D, dtype=jnp.bfloat16, name="down")(m)


class Chain(nn.Module):
    windows: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(DEPTH):
            x = Block(windows=self.windows, name=f"b{i}")(x)
        return x


def run_chain(name, shape, windows=False):
    model = Chain(windows=windows)
    x = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.bfloat16)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x)["params"])
    params = _random_params(shapes)
    dt = _timeit_device_loop(
        lambda p, xx: model.apply({"params": p}, xx), params, x, iters=4
    )
    print(json.dumps({"variant": name, "ms": round(dt * 1e3, 2)}), flush=True)


def run_patchpos():
    from ufvideo_tpu.configs import SAM2HieraConfig

    cfg = SAM2HieraConfig()

    class PatchPos(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(cfg.embed_dim, (7, 7), strides=(4, 4),
                        padding=[(3, 3)] * 2, dtype=jnp.bfloat16,
                        name="patch")(x)
            b, h, w, _ = x.shape
            bg = self.param("pos", nn.initializers.zeros,
                            (7, 7, cfg.embed_dim), jnp.float32)
            win = self.param("win", nn.initializers.zeros,
                             (8, 8, cfg.embed_dim), jnp.float32)
            bg_r = jax.image.resize(bg, (h, w, cfg.embed_dim), method="bicubic")
            pos = bg_r + jnp.tile(win, (h // 8, w // 8, 1))
            return x + pos[None].astype(x.dtype)

    model = PatchPos()
    x = jax.random.normal(jax.random.PRNGKey(1), (FRAMES, 1024, 1024, 3),
                          jnp.bfloat16)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x)["params"])
    params = _random_params(shapes)
    dt = _timeit_device_loop(
        lambda p, xx: model.apply({"params": p}, xx), params, x, iters=4
    )
    print(json.dumps({"variant": "patchpos", "ms": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["mlp4d", "mlp4dwin", "patchpos"]):
        if v == "mlp3d":
            run_chain(v, (FRAMES, G * G, D))
        elif v == "mlp4d":
            run_chain(v, (FRAMES, G, G, D))
        elif v == "mlp4dwin":
            run_chain(v, (FRAMES, G, G, D), windows=True)
        elif v == "patchpos":
            run_patchpos()
