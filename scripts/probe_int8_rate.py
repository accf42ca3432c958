"""On-chip probe: raw MXU dot rate — bf16 vs s8xs8->s32, XLA vs Pallas.

Settles whether this chip's int8 MXU path can deliver the nominal 2x of
bf16 anywhere reachable (XLA dot, Mosaic dot), at the SigLIP fc1 shape
that dominates the W8A8 tower. If neither lowers above ~1.2-1.5x, the
fused W8A8 tower (337 f/s, PERF.md round 4/5) is at its practical ceiling
and VERDICT r4 #6 closes with a physics note instead of more kernel work.

Timing: sequentially-dependent scan chain with elementwise feedback (a
scalar perturbation is NOT enough for a bare dot — XLA commutes it out;
PERF.md round-4 methodology note). Prints one JSON line per variant.
"""
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from ufvideo_tpu.utils import maybe_enable_compile_cache  # noqa: E402

maybe_enable_compile_cache()

# SigLIP fc1-ish shape: rows = one 64-image batch of 729-token windows,
# padded to a friendly row count; (din, dout) = (1152, 4304)
ROWS, DIN, DOUT = 8192, 1152, 4304


def timeit_chain(step, x0, w, iters=64):
    din = x0.shape[-1]

    def run_n(n):
        @jax.jit
        def run(x0, w):
            def body(carry, _):
                x = x0 * (1.0 + 1e-6 * jnp.tanh(carry)).astype(x0.dtype)
                out = step(x, w)
                return jnp.mean(out.astype(jnp.float32)), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c

        float(run(x0, w))  # warm compile
        t0 = time.perf_counter()
        float(run(x0, w))
        return time.perf_counter() - t0

    t1 = run_n(1)
    tn = run_n(iters)
    return max((tn - t1) / (iters - 1), 1e-9)


def bf16_step(x, w):
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def int8_xla_step(x, w):
    # quantize is outside the timed contraction's critical path concern:
    # we want the RAW dot rate, so feed pre-quantized int8 and measure
    # the s8xs8->s32 contraction alone (cast x in-body from the carried
    # bf16 perturbation to keep the chain honest)
    q = jnp.clip(jnp.round(x.astype(jnp.float32)), -127, 127).astype(jnp.int8)
    return jax.lax.dot_general(
        q, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _pallas_dot_kernel(x_ref, w_ref, o_ref, *, quant):
    from jax.experimental import pallas as pl  # noqa: F401

    x = x_ref[...]
    if quant:
        q = jnp.clip(jnp.round(x.astype(jnp.float32)), -127, 127).astype(
            jnp.int8
        )
        o_ref[...] = jax.lax.dot_general(
            q, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    else:
        o_ref[...] = jax.lax.dot_general(
            x, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def pallas_step(x, w, quant, bw=512):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = x.shape[0]
    out_dt = jnp.int32 if quant else jnp.float32
    return pl.pallas_call(
        functools.partial(_pallas_dot_kernel, quant=quant),
        grid=(rows // bw,),
        in_specs=[
            pl.BlockSpec((bw, DIN), lambda i: (i, 0)),
            pl.BlockSpec((DIN, DOUT), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bw, DOUT), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, DOUT), out_dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
    )(x, w)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (ROWS, DIN), jnp.bfloat16) * 4.0
    wf = jax.random.normal(jax.random.PRNGKey(1), (DIN, DOUT), jnp.bfloat16)
    wq = jnp.clip(
        jnp.round(jax.random.normal(jax.random.PRNGKey(2), (DIN, DOUT)) * 30),
        -127, 127,
    ).astype(jnp.int8)
    flops = 2.0 * ROWS * DIN * DOUT

    for tag, step, w in [
        ("bf16_xla", bf16_step, wf),
        ("int8_xla", int8_xla_step, wq),
        ("bf16_pallas", lambda x, w: pallas_step(x, w, False), wf),
        ("int8_pallas", lambda x, w: pallas_step(x, w, True), wq),
    ]:
        try:
            dt = timeit_chain(step, x, w)
            print(json.dumps({
                "variant": tag,
                "ms": round(dt * 1e3, 3),
                "tops": round(flops / dt / 1e12, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(json.dumps({"variant": tag, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
