"""Fused Hiera transformer block as a single Pallas kernel.

One MultiScaleBlock (reference sam2.py:1049-1131) with ``dim == dim_out``
and no q-pooling is seven HBM round-trips when expressed as separate XLA
ops: LN1, qkv matmul, window attention, proj matmul, LN2, fc1+gelu, fc2 —
plus residual adds. At Hiera-L stage-3 shapes ([128 windows, 256 tokens,
576ch] for an 8-frame 1024² encode) the activations are ~19 MB per pass, so
the block is memory-bound even though its matmuls are MXU-friendly
(measured: the unfused trunk's non-attention ops ran at ~47% of the chip's
sustained matmul rate, PERF.md).

This kernel runs the WHOLE block per grid step on ``bw`` windows
(~1024 rows): activations make exactly one HBM round-trip, the six weight
matrices (~8 MB at stage-3) stay resident in VMEM across steps, every
matmul sees an MXU-shaped [1024, C] operand, and the window softmax uses
the same exp2/bf16 scheme as ops/window_attention.py. Window counts are
grouped ``gw`` windows per masked score matrix for sub-128-token windows
(block-diagonal FLOP waste bounded at ~128 rows, as in window_attention).

Forward-only; VJP recomputes through the XLA reference (the SAM2 image
encoder is frozen in reference training, train.py:916 → freeze). Math
matches MultiScaleBlock exactly: f32 LayerNorm (eps 1e-6), bf16 matmuls
with f32 accumulation, softmax scale head_dim**-0.5, exact (erf) GELU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)
_LOG2E = 1.4426950408889634


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf, |err| <= 1.5e-7 (f32-exact
    for GELU purposes; Mosaic has no native erf/erfc lowering)."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """0.5x(1+erf(x/sqrt(2))) — reference nn.GELU default, via _erf."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _gelu_tanh(x):
    """gelu_pytorch_tanh (HF SigLIP hidden_act)."""
    return 0.5 * x * (
        1.0 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * x * x * x))
    )


_ACTS = {"gelu_exact": _gelu_exact, "gelu_tanh": _gelu_tanh}


def _layernorm(x32, scale, bias, eps=1e-6):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    c = x32 - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    return c * jax.lax.rsqrt(var + eps) * scale + bias


def _kernel(
    x_ref,  # [bw, S, C]
    ln1_s_ref, ln1_b_ref,  # [1, C] f32
    wqkv_ref, bqkv_ref,  # [C, 3*H*hp], [1, 3*H*hp]
    wproj_ref, bproj_ref,  # [H*hp, C], [1, C]
    ln2_s_ref, ln2_b_ref,  # [1, C]
    w1_ref, b1_ref,  # [C, M], [1, M]
    w2_ref, b2_ref,  # [M, C], [1, C]
    o_ref,  # [bw, S, C]
    att_ref,  # scratch [bw*S, H*hp]
    *,
    num_heads: int,
    head_dim: int,
    head_pad: int,
    tokens: int,
    bw: int,
    gw: int,
    act: str,
    eps: float,
):
    rows = bw * tokens
    hp = head_pad
    hw = num_heads * hp
    scale = head_dim ** -0.5
    dtype = x_ref.dtype

    x = x_ref[...].reshape(rows, x_ref.shape[-1])
    xn = _layernorm(
        x.astype(jnp.float32), ln1_s_ref[0, :], ln1_b_ref[0, :], eps
    ).astype(dtype)

    qkv = (
        jax.lax.dot_general(
            xn, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        + bqkv_ref[0, :]
    ).astype(dtype)

    grows = gw * tokens
    if gw > 1:
        win_r = jax.lax.broadcasted_iota(jnp.int32, (grows, grows), 0) // tokens
        win_c = jax.lax.broadcasted_iota(jnp.int32, (grows, grows), 1) // tokens
        same = win_r == win_c
    for g in range(rows // grows):
        sl = slice(g * grows, (g + 1) * grows)
        for h in range(num_heads):
            q = (
                qkv[sl, h * hp : (h + 1) * hp].astype(jnp.float32)
                * (scale * _LOG2E)
            ).astype(dtype)
            k = qkv[sl, hw + h * hp : hw + (h + 1) * hp]
            v = qkv[sl, 2 * hw + h * hp : 2 * hw + (h + 1) * hp]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            if gw > 1:
                s = jnp.where(same, s, _NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2((s - m).astype(dtype))
            denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            o = jnp.dot(
                p, v, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ) / denom
            att_ref[sl, h * hp : (h + 1) * hp] = o.astype(dtype)

    att = (
        jax.lax.dot_general(
            att_ref[...], wproj_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        + bproj_ref[0, :]
    ).astype(dtype)
    x1 = x + att

    xm = _layernorm(
        x1.astype(jnp.float32), ln2_s_ref[0, :], ln2_b_ref[0, :], eps
    ).astype(dtype)
    hmid = (
        jax.lax.dot_general(
            xm, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        + b1_ref[0, :]
    )
    # exact GELU (reference nn.GELU default) on the f32 accumulator before
    # the bf16 cast
    hmid = _ACTS[act](hmid).astype(dtype)
    mlp = (
        jax.lax.dot_general(
            hmid, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        + b2_ref[0, :]
    ).astype(dtype)
    out = x1 + mlp
    o_ref[...] = out.reshape(o_ref.shape)


def _reference(x, params, num_heads, head_dim, head_pad, act="gelu_exact", eps=1e-6):
    """XLA reference with identical math (mirrors MultiScaleBlock)."""
    (ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b, w1, b1, w2,
     b2) = params
    n, s, c = x.shape
    hp = head_pad
    dtype = x.dtype
    xn = _layernorm(x.astype(jnp.float32), ln1_s, ln1_b, eps).astype(dtype)
    qkv = (xn @ wqkv + bqkv).astype(dtype)
    qh = qkv[..., : num_heads * hp].reshape(n, s, num_heads, hp)
    kh = qkv[..., num_heads * hp : 2 * num_heads * hp].reshape(
        n, s, num_heads, hp
    )
    vh = qkv[..., 2 * num_heads * hp :].reshape(n, s, num_heads, hp)
    logits = (
        jnp.einsum("nqhd,nkhd->nhqk", qh, kh,
                   preferred_element_type=jnp.float32)
        * head_dim ** -0.5
    )
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum(
        "nhqk,nkhd->nqhd", probs.astype(dtype), vh,
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    att = (o.reshape(n, s, num_heads * hp) @ wproj + bproj).astype(dtype)
    x1 = x + att
    xm = _layernorm(x1.astype(jnp.float32), ln2_s, ln2_b, eps).astype(dtype)
    h = _ACTS[act]((xm @ w1 + b1).astype(jnp.float32)).astype(dtype)
    return x1 + (h @ w2 + b2).astype(dtype)


def _pick_bw(num_windows: int, tokens: int, num_heads: int):
    """(bw, gw): ~128-row score groups, ~1024 rows per grid step, capped at
    64 unrolled attention dot-pairs per step (compile-time/issue budget)."""
    gw = max(1, 128 // tokens)
    while gw > 1 and num_windows % gw != 0:
        gw //= 2
    bw = gw
    while (
        bw * 2 * tokens <= 1024
        and num_windows % (bw * 2) == 0
        and (bw * 2 // gw) * num_heads <= 64
    ):
        bw *= 2
    return bw, gw


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def fused_hiera_block(
    x: jnp.ndarray,  # [N, S, C] window-major tokens
    params: tuple,  # (ln1_s, ln1_b, wqkv, bqkv, wproj, bproj,
    #                 ln2_s, ln2_b, w1, b1, w2, b2)
    num_heads: int,
    head_dim: int,
    head_pad: int = 0,
    interpret: bool = False,
    act: str = "gelu_exact",
    eps: float = 1e-6,
) -> jnp.ndarray:
    """One full pre-LN transformer block (dim==dim_out, no q-pool):
    Hiera windowed blocks and, with a single whole-sequence "window" per
    image and act="gelu_tanh", SigLIP encoder layers."""
    return _forward(x, params, num_heads, head_dim, head_pad, interpret, act, eps)


def _forward(x, params, num_heads, head_dim, head_pad, interpret, act="gelu_exact", eps=1e-6):
    n, s, c = x.shape
    hp = head_pad or head_dim
    if not interpret and jax.default_backend() != "tpu":
        return _reference(x, params, num_heads, head_dim, hp, act, eps)
    (ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b, w1, b1, w2,
     b2) = params
    mlp_dim = w1.shape[1]
    bw, gw = _pick_bw(n, s, num_heads)
    kernel = functools.partial(
        _kernel, num_heads=num_heads, head_dim=head_dim, head_pad=hp,
        tokens=s, bw=bw, gw=gw, act=act, eps=eps,
    )
    f32 = jnp.float32

    def vec(a, dt=None):  # 1D params as [1, D] rows for clean VMEM layout
        return a.reshape(1, -1).astype(dt) if dt else a.reshape(1, -1)

    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    return pl.pallas_call(
        kernel,
        grid=(n // bw,),
        in_specs=[
            pl.BlockSpec((bw, s, c), lambda i: (i, 0, 0)),
            full((1, c)), full((1, c)),
            full(wqkv.shape), full((1, wqkv.shape[1])),
            full(wproj.shape), full((1, c)),
            full((1, c)), full((1, c)),
            full(w1.shape), full((1, mlp_dim)),
            full(w2.shape), full((1, c)),
        ],
        out_specs=pl.BlockSpec((bw, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, s, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((bw * s, num_heads * hp), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=interpret,
    )(
        x,
        vec(ln1_s, f32), vec(ln1_b, f32),
        wqkv.astype(x.dtype), vec(bqkv, f32),
        wproj.astype(x.dtype), vec(bproj, f32),
        vec(ln2_s, f32), vec(ln2_b, f32),
        w1.astype(x.dtype), vec(b1, f32),
        w2.astype(x.dtype), vec(b2, f32),
    )


def _fwd(x, params, num_heads, head_dim, head_pad, interpret, act, eps):
    return (
        _forward(x, params, num_heads, head_dim, head_pad, interpret, act, eps),
        (x, params),
    )


def _bwd(num_heads, head_dim, head_pad, interpret, act, eps, res, g):
    x, params = res
    hp = head_pad or head_dim
    _, vjp = jax.vjp(
        lambda xx, pp: _reference(xx, pp, num_heads, head_dim, hp, act, eps),
        x, params,
    )
    return vjp(g)


fused_hiera_block.defvjp(_fwd, _bwd)
