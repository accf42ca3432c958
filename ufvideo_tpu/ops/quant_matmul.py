"""Pallas int4 dequant-matmul: packed 4-bit weights → matmul without ever
materializing the dequantized kernel in HBM.

XLA cannot fuse the nibble unpack (`quant.unpack_int4`) into a dot operand,
so the plain einsum path materializes a full int8 copy of every weight to
HBM each step — measured 3.9 tok/s for 7B int4 decode vs int8's 90 (the
decode loop is weight-bandwidth-bound; the materialization turns a 3.8 GB
read into read+write+read of ~19 GB). This kernel reads the packed bytes
(half of int8's traffic), sign-extends the nibbles and applies the
per-(input-group, column) scales in VMEM, and accumulates the matmul in f32.

Layout tricks:
- `pack_int4` stores logical row 2i in the low nibble and row 2i+1 in the
  high nibble of packed row i. Instead of re-interleaving rows in VMEM (a
  sublane shuffle over the whole weight block), the caller splits the
  activation lanes once (x_even = x[..., 0::2], x_odd = x[..., 1::2] — a
  few KB) and the kernel computes x_even @ lo + x_odd @ hi on the
  un-interleaved nibble planes.
- The low nibble is stored biased +8, so its extraction is a single
  `p & 15` (no per-element sign fix — Mosaic has no int8 vector shifts and
  every extra VPU op on 7.1G weight elements costs ~1.5 ms/step); the -8
  de-bias is algebraically `8·Σ_g xe_g · s_g`, one [rows, g]@[g, nt] dot
  against precomputed activation group-sums.
- Group scales broadcast over the group's packed rows via a leading-dim
  reshape Mosaic lowers for free.

Serving matvec shape (decode: a few rows against a huge weight): grid over
output-column tiles, full contraction per step. Prefill-sized row counts
fall back to the XLA einsum (compute-bound there, and the one-off
materialization amortizes over thousands of rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _int4_kernel(
    xe_ref,  # [rows, din/2] bf16 — even logical lanes of x
    xo_ref,  # [rows, din/2] bf16 — odd logical lanes
    rs_ref,  # [rows, g] f32 — per-scale-group sums of xe (offset fold)
    q_ref,  # [din/2, nt] int8 packed (lo nibble biased +8, hi signed)
    s_ref,  # [g, nt] f32 per-(group, column) scales
    o_ref,  # [rows, nt] f32
    *,
    group_half: int,  # packed rows per scale group (= group // 2)
):
    p = q_ref[...]
    dh, nt = p.shape
    g = dh // group_half
    s = s_ref[...].astype(jnp.bfloat16)  # [g, nt]
    srep = jnp.broadcast_to(
        s.reshape(g, 1, nt), (g, group_half, nt)
    ).reshape(dh, nt)
    # branch-free nibble extraction (Mosaic has no int8 vector shifts, so
    # the bit ops run in int32): the low nibble is stored biased +8, so
    # `p & 15` IS lo+8 — no per-element sign fix; the -8 de-bias folds into
    # one small dot below. hi sign-extends via an arithmetic i32 shift.
    p32 = p.astype(jnp.int32)
    lo8 = (p32 & 15).astype(jnp.bfloat16)
    hi = (p32 >> 4).astype(jnp.bfloat16)
    wl = lo8 * srep
    wh = hi * srep
    acc = jax.lax.dot_general(
        xe_ref[...], wl, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    acc = acc + jax.lax.dot_general(
        xo_ref[...], wh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    # de-bias: subtract 8·Σ_g xe_g · s_g — one [rows, g]@[g, nt] dot
    corr = jax.lax.dot_general(
        rs_ref[...].astype(jnp.bfloat16), s * jnp.bfloat16(8.0),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    o_ref[...] = acc - corr


def int4_matmul(
    x: jnp.ndarray,  # [..., din]
    q8: jnp.ndarray,  # [din/2, dout] packed int8 (quant.pack_int4 layout)
    scales: jnp.ndarray,  # [din/group, dout] f32
    group: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """x @ dequant(q8, scales) with the packed int4 kernel → [..., dout] f32.

    NOT bit-identical to the grouped-einsum reference: the +8-biased low
    nibble means the kernel rounds (w+8)·s at bf16 and de-biases in f32,
    whereas the einsum rounds w·s — a different bf16 rounding point, on top
    of f32 accumulation-order differences. Measured divergence ~1e-2
    max-normalized at 7B dims (see test_int4_matmul_kernel_interpret's
    tolerance); both sit within int4 quantization error itself."""
    *lead, din = x.shape
    dh, dout = q8.shape
    assert 2 * dh == din and group % 2 == 0 and din % group == 0
    rows = 1
    for d in lead:
        rows *= d
    g = din // group
    x2 = x.reshape(rows, din).astype(jnp.bfloat16)
    xe = x2[:, 0::2]
    xo = x2[:, 1::2]
    # per-scale-group sums of the even lanes (the +8-bias fold); computed
    # once outside the kernel — a few KB
    rs = jnp.sum(
        xe.astype(jnp.float32).reshape(rows, g, group // 2), axis=-1
    )
    nt = 512 if dout % 512 == 0 else (256 if dout % 256 == 0 else dout)
    if din > 8192 and nt > 256 and dout % 256 == 0:
        nt = 256  # bound the per-step dequantized VMEM blocks
    out = pl.pallas_call(
        functools.partial(_int4_kernel, group_half=group // 2),
        grid=(dout // nt,),
        in_specs=[
            pl.BlockSpec((rows, dh), lambda i: (0, 0)),
            pl.BlockSpec((rows, dh), lambda i: (0, 0)),
            pl.BlockSpec((rows, g), lambda i: (0, 0)),
            pl.BlockSpec((dh, nt), lambda i: (0, i)),
            pl.BlockSpec((g, nt), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((rows, nt), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((rows, dout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=interpret,
    )(xe, xo, rs, q8, scales.astype(jnp.float32))
    return out.reshape(*lead, dout)


def int4_matmul_reference(x, q8, scales, group):
    """XLA reference with the same bf16 dequantized values (for parity
    tests; this is also exactly the einsum path's math when the einsum
    consumes bf16 operands)."""
    from ..quant import unpack_int4

    *lead, din = x.shape
    g = din // group
    dout = q8.shape[-1]
    q = unpack_int4(q8).astype(jnp.float32).reshape(g, group, dout)
    w = (q * scales[:, None, :]).astype(jnp.bfloat16).reshape(din, dout)
    return jnp.dot(
        x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )


def _int8_kernel(
    x_ref,  # [rows, din] bf16
    q_ref,  # [din, nt] int8
    s_ref,  # [1, nt] f32 per-column scales
    o_ref,  # [rows, nt] f32
):
    w = q_ref[...].astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        x_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    o_ref[...] = acc * s_ref[...]


def int8_matvec(
    x: jnp.ndarray,  # [..., din]
    q: jnp.ndarray,  # [din, dout] int8
    scale: jnp.ndarray,  # [dout] f32 per-output-column
    nt: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Decode-shaped x @ dequant(q, scale) as an explicitly tiled Pallas
    matvec: grid over output-column tiles, full contraction per step, the
    int8 weight tile double-buffered by the Pallas pipeline. Exists as the
    hand-scheduled alternative to XLA's matvec, which streams int8 decode
    weights at only ~80% of HBM speed (PERF.md round-4 bisection)."""
    *lead, din = x.shape
    dout = q.shape[1]
    rows = 1
    for d in lead:
        rows *= d
    x2 = x.reshape(rows, din).astype(jnp.bfloat16)
    if not nt:
        nt = 512 if dout % 512 == 0 else (256 if dout % 256 == 0 else dout)
    out = pl.pallas_call(
        _int8_kernel,
        grid=(dout // nt,),
        in_specs=[
            pl.BlockSpec((rows, din), lambda i: (0, 0)),
            pl.BlockSpec((din, nt), lambda i: (0, i)),
            pl.BlockSpec((1, nt), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((rows, nt), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((rows, dout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=interpret,
    )(x2, q, scale.reshape(1, -1).astype(jnp.float32))
    return out.reshape(*lead, dout)
