"""On-chip A/B: XLA int8 dequant matvec vs Pallas ops.quant_matmul.int8_matvec.

Decode-shaped (rows=1) dequant matmuls at the Qwen2-7B layer shapes. The
round-4 bisection (PERF.md) showed the XLA path streams int8 weights at only
~80% of HBM speed uniformly across layers; this probe measures whether the
hand-scheduled double-buffered Pallas matvec does better, per shape.

Timing: sequentially-dependent scan chain with ELEMENTWISE feedback
(x_{t+1} = x0 * (1 + eps * tanh(out[:din]))) — a scalar perturbation is NOT
enough for a bare dot (XLA commutes the scalar past the dot and hoists it,
see PERF.md round-4 methodology note).

Prints one JSON line per (shape, variant): ms/step and achieved GB/s.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from ufvideo_tpu.ops.quant_matmul import int8_matvec  # noqa: E402
from ufvideo_tpu.utils import maybe_enable_compile_cache  # noqa: E402

maybe_enable_compile_cache()

# Qwen2-7B decode matvec shapes (din, dout, tag)
SHAPES = [
    (3584, 4608, "qkv"),
    (3584, 3584, "o_proj"),
    (3584, 18944, "gate/up"),
    (18944, 3584, "down"),
    (3584, 152064, "lm_head"),
]


def timeit_chain(step, x0, q, s, iters=512):
    # iters must be LARGE: a single decode matvec is 0.1-1 ms, and this
    # remote runtime's dispatch+readback jitter is tens of ms — at iters=8
    # (first attempt) (tn - t1) sat below the noise floor and several shapes
    # "measured" 0 ms. The model-level bisection in PERF.md remains the
    # authoritative per-shape source; this probe is a secondary diagnostic.
    din = x0.shape[-1]

    def run_n(n):
        @jax.jit
        def run(x0, q, s):
            def body(carry, _):
                x = x0 * (1.0 + 1e-6 * jnp.tanh(carry)).astype(x0.dtype)
                out = step(x, q, s)
                nxt = out.astype(jnp.float32)[..., :din]
                if nxt.shape[-1] < din:
                    nxt = jnp.pad(nxt, ((0, 0), (0, din - nxt.shape[-1])))
                return nxt, None

            c, _ = jax.lax.scan(body, jnp.zeros_like(x0, jnp.float32), None, length=n)
            return jnp.mean(c)

        float(run(x0, q, s))  # warm compile
        t0 = time.perf_counter()
        v = float(run(x0, q, s))
        assert v == v
        return time.perf_counter() - t0

    t1 = run_n(1)
    tn = run_n(iters)
    return max((tn - t1) / (iters - 1), 1e-9)


def xla_step(x, q, s):
    y = jnp.dot(x, q.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return (y * s).astype(jnp.bfloat16)


def pallas_step(x, q, s):
    return int8_matvec(x, q, s).astype(jnp.bfloat16)


def main():
    key = jax.random.PRNGKey(0)
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    for din, dout, tag in SHAPES:
        kq, kx = jax.random.split(jax.random.fold_in(key, din * dout))
        q = jax.random.randint(kq, (din, dout), -127, 128, jnp.int32).astype(jnp.int8)
        s = jnp.full((dout,), 0.01, jnp.float32)
        x = 0.1 * jax.random.normal(kx, (rows, din), jnp.bfloat16)
        gb = din * dout / 1e9
        for name, step in (("xla", xla_step), ("pallas", pallas_step)):
            try:
                dt = timeit_chain(step, x, q, s)
                print(json.dumps({
                    "shape": f"{tag} [{din}x{dout}] rows={rows}", "variant": name,
                    "ms": round(dt * 1e3, 4), "GB_per_s": round(gb / dt, 1),
                }), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({
                    "shape": f"{tag} [{din}x{dout}]", "variant": name,
                    "error": repr(e)[:200],
                }), flush=True)


if __name__ == "__main__":
    main()
