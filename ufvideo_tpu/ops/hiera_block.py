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


# Minimax polynomial GELU (FMA-only — no transcendental, no divide):
# gelu(x) = x * (0.5 + xc*Q(t)), xc = clip(x, ±B), t = 2*xc²/B² - 1,
# Q a degree-9 monomial in t (Chebyshev-fit + Lawson minimax, this repo's
# round-3 notes). Max |error| vs exact erf-GELU: 1.1e-4 in f32 — invisible
# under the kernel's bf16 output cast (bf16 quantization alone is ~3e-2 at
# the tails). Cuts the VPU cost of the A-S erf (exp + divide per element).
_GELU_POLY_B = 4.5
_GELU_POLY_CT = (
    0.1569060442880844, -0.07718588485083337, 0.054637490167050023,
    -0.04023694830724554, 0.02885765287056899, -0.018484084923067773,
    0.009653220256290044, -0.006070030404158596, 0.004962705354373479,
    -0.0019306118341346908,
)


# Companion fit of HF's gelu_pytorch_tanh (SigLIP hidden_act): |err| vs the
# tanh form ≤ 6.2e-6 in f64 — replaces the transcendental tanh per element.
_GELU_TANH_POLY_CT = (
    0.15693845830119607, -0.077295380617666, 0.054784027802834236,
    -0.04004952801103731, 0.02807726149055056, -0.018491884341240026,
    0.010685858987061678, -0.005250474306093966, 0.003522283558394471,
    -0.0028267368523108055, 0.0010171322565724434,
)


def _poly_gelu_eval(x, ct):
    b = _GELU_POLY_B
    xc = jnp.clip(x, -b, b)
    t = xc * xc * (2.0 / (b * b)) - 1.0
    q = jnp.full_like(t, ct[-1])
    for ck in ct[-2::-1]:
        q = q * t + ck
    return x * (0.5 + xc * q)


def _gelu_poly(x):
    return _poly_gelu_eval(x, _GELU_POLY_CT)


def _gelu_poly_bf16(x):
    """Same polynomial evaluated at bf16 vector width (2x VPU throughput);
    added noise is below the kernel's bf16 output quantization."""
    return _gelu_poly(x.astype(jnp.bfloat16))


def _gelu_tanh_poly(x):
    return _poly_gelu_eval(x, _GELU_TANH_POLY_CT)


def _gelu_tanh_poly_bf16(x):
    return _gelu_tanh_poly(x.astype(jnp.bfloat16))


_ACTS = {
    "gelu_exact": _gelu_exact,
    "gelu_tanh": _gelu_tanh,
    "gelu_poly": _gelu_poly,
    "gelu_poly_bf16": _gelu_poly_bf16,
    "gelu_tanh_poly": _gelu_tanh_poly,
    "gelu_tanh_poly_bf16": _gelu_tanh_poly_bf16,
    "identity": lambda x: x,  # diagnostic only: measures the GELU VPU share
}


def _layernorm(x32, scale, bias, eps=1e-6):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    c = x32 - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    return c * jax.lax.rsqrt(var + eps) * scale + bias


def _block_body(
    x,  # [rows, C] value (residual stream)
    refs,  # 12 parameter refs: (ln1_s, ln1_b, wqkv, bqkv, wproj, bproj,
    #                            ln2_s, ln2_b, w1, b1, w2, b2)
    att_ref,  # scratch [rows, H*hs]
    qkv_ref,  # scratch [rows, 3*H*hs] (None unless align == "scratch")
    *,
    num_heads: int,
    head_dim: int,
    head_pad: int,
    tokens: int,
    gw: int,
    act: str,
    eps: float,
    align: str,  # "off" | "scratch" | "padw"
):
    """One whole pre-LN block on a resident [rows, C] value. Shared by the
    single-block kernel and the multi-block stage kernel (the whole stage is
    row-parallel: windows never interact across same-window blocks)."""
    (ln1_s_ref, ln1_b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
     ln2_s_ref, ln2_b_ref, w1_ref, b1_ref, w2_ref, b2_ref) = refs
    rows = x.shape[0]
    hp = head_pad
    # hs: lane stride of one head inside the attention scratches. With
    # align="scratch" every head occupies a 128-lane-aligned slot filled by
    # an explicit shuffle pass; with "padw" the qkv weight COLUMNS are
    # zero-padded per head slot so the matmul itself writes aligned slots
    # (no shuffle, more qkv-dot FLOPs). Zero lanes are inert in both
    # contractions either way.
    hs = 128 if align in ("scratch", "padw") else hp
    hw = num_heads * hp
    hws = num_heads * hs
    scale = head_dim ** -0.5
    dtype = x.dtype

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
    if align == "scratch":
        # one shuffle pass per step: packed heads → 128-aligned slots.
        # Full-slot stores (zero pad lanes) — scratch memory is otherwise
        # uninitialized and the pad lanes enter the contractions.
        zpad = jnp.zeros((rows, hs - hp), dtype)
        for j in range(3 * num_heads):
            qkv_ref[:, j * hs : (j + 1) * hs] = jnp.concatenate(
                [qkv[:, j * hp : (j + 1) * hp], zpad], axis=1
            )

    grows = gw * tokens
    if gw > 1:
        win_r = jax.lax.broadcasted_iota(jnp.int32, (grows, grows), 0) // tokens
        win_c = jax.lax.broadcasted_iota(jnp.int32, (grows, grows), 1) // tokens
        same = win_r == win_c
    for g in range(rows // grows):
        sl = slice(g * grows, (g + 1) * grows)
        for h in range(num_heads):
            if align == "scratch":
                q = (
                    qkv_ref[sl, h * hs : (h + 1) * hs].astype(jnp.float32)
                    * (scale * _LOG2E)
                ).astype(dtype)
                k = qkv_ref[sl, hws + h * hs : hws + (h + 1) * hs]
                v = qkv_ref[sl, 2 * hws + h * hs : 2 * hws + (h + 1) * hs]
            else:  # "padw" reads aligned slots straight from the dot output
                q = (
                    qkv[sl, h * hs : (h + 1) * hs].astype(jnp.float32)
                    * (scale * _LOG2E)
                ).astype(dtype)
                k = qkv[sl, hws + h * hs : hws + (h + 1) * hs]
                v = qkv[sl, 2 * hws + h * hs : 2 * hws + (h + 1) * hs]
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
            att_ref[sl, h * hs : (h + 1) * hs] = o.astype(dtype)

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
    # GELU in f32 (stricter than the reference's bf16 autocast; a bf16-GELU
    # knob was tried and removed — the A-S erf fails to lower on bf16
    # operands and GROUP_ROWS-style wins weren't there, PERF.md r3)
    hmid = _ACTS[act](hmid).astype(dtype)
    mlp = (
        jax.lax.dot_general(
            hmid, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        + b2_ref[0, :]
    ).astype(dtype)
    return x1 + mlp


def _kernel(
    x_ref,  # [bw, S, C]
    *args,  # 12 param refs, o_ref, att_ref, qkv_ref
    num_heads: int,
    head_dim: int,
    head_pad: int,
    tokens: int,
    bw: int,
    gw: int,
    act: str,
    eps: float,
    align: str,
):
    refs, (o_ref, att_ref, qkv_ref) = args[:12], args[12:]
    rows = bw * tokens
    x = x_ref[...].reshape(rows, x_ref.shape[-1])
    out = _block_body(
        x, refs, att_ref, qkv_ref, num_heads=num_heads, head_dim=head_dim,
        head_pad=head_pad, tokens=tokens, gw=gw, act=act, eps=eps,
        align=align,
    )
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
    """(bw, gw): ~GROUP_ROWS-row score groups (default 128), ~1024 rows per
    grid step, capped at 64 unrolled attention dot-pairs per step
    (compile-time/issue budget). UFVIDEO_HIERA_GROUP_ROWS widens the score
    groups for tiny windows (more masked-FLOP waste on the score dots —
    ~7% of block FLOPs — against fewer, larger MXU invocations)."""
    import os

    group_rows = int(os.environ.get("UFVIDEO_HIERA_GROUP_ROWS", "128"))
    gw = max(1, group_rows // tokens)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
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
    align_qkv: bool = False,
) -> jnp.ndarray:
    """One full pre-LN transformer block (dim==dim_out, no q-pool):
    Hiera windowed blocks and, with a single whole-sequence "window" per
    image and act="gelu_tanh", SigLIP encoder layers.

    ``align_qkv``: give each head a 128-lane-aligned VMEM slot (one shuffle
    pass per step) instead of packed ``head_pad``-lane slices. Measured
    per-model: Hiera-L 42.0 → 47.8 f/s, but SigLIP 239 → 222 — callers pick
    (UFVIDEO_HIERA_ALIGN_QKV=0/1 overrides both for experiments)."""
    return _forward(
        x, params, num_heads, head_dim, head_pad, interpret, act, eps,
        align_qkv,
    )


def _resolve_align(align_qkv, hp):
    """Per-caller align flag + UFVIDEO_HIERA_ALIGN_QKV override → (mode,
    per-head slot width). Single source of truth for fused_hiera_block AND
    fused_hiera_stage — the two kernels must agree on weight layout."""
    import os

    align = {True: "scratch", False: "off"}.get(align_qkv, align_qkv)
    env_align = os.environ.get("UFVIDEO_HIERA_ALIGN_QKV", "")
    if env_align:
        align = {"0": "off", "1": "scratch"}.get(env_align, env_align)
    if hp % 128 == 0:
        align = "off"
    return align, (128 if align in ("scratch", "padw") else hp)


def _pad_weights_for_align(align, wqkv, bqkv, wproj, num_heads, hp, hs, c):
    """Zero-pad per-head weight slots for the aligned layouts.

    "scratch"/"padw": zero-ROW-pad each head's slice of wproj to its
    128-lane slot so the aligned att scratch contracts directly (zero rows
    inert). "padw" additionally zero-pads the qkv weight COLUMNS (and bias)
    per head slot: the qkv dot then writes 128-aligned slots directly — no
    shuffle pass, at the cost of wider qkv-dot FLOPs (inert zero columns)."""
    if align in ("scratch", "padw"):
        wp = wproj.reshape(num_heads, hp, c)
        wproj = jnp.concatenate(
            [wp, jnp.zeros((num_heads, hs - hp, c), wproj.dtype)], axis=1
        ).reshape(num_heads * hs, c)
    if align == "padw":
        wq3 = wqkv.reshape(c, 3 * num_heads, hp)
        wqkv = jnp.concatenate(
            [wq3, jnp.zeros((c, 3 * num_heads, hs - hp), wqkv.dtype)], axis=2
        ).reshape(c, 3 * num_heads * hs)
        bq3 = bqkv.reshape(3 * num_heads, hp)
        bqkv = jnp.concatenate(
            [bq3, jnp.zeros((3 * num_heads, hs - hp), bqkv.dtype)], axis=1
        ).reshape(3 * num_heads * hs)
    return wqkv, bqkv, wproj


def _forward(x, params, num_heads, head_dim, head_pad, interpret,
             act="gelu_exact", eps=1e-6, align_qkv=False):
    n, s, c = x.shape
    hp = head_pad or head_dim
    if not interpret and jax.default_backend() != "tpu":
        return _reference(x, params, num_heads, head_dim, hp, act, eps)
    (ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b, w1, b1, w2,
     b2) = params
    mlp_dim = w1.shape[1]
    bw, gw = _pick_bw(n, s, num_heads)
    align, hs = _resolve_align(align_qkv, hp)
    wqkv, bqkv, wproj = _pad_weights_for_align(
        align, wqkv, bqkv, wproj, num_heads, hp, hs, c
    )
    kernel = functools.partial(
        _kernel, num_heads=num_heads, head_dim=head_dim, head_pad=hp,
        tokens=s, bw=bw, gw=gw, act=act, eps=eps, align=align,
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
        scratch_shapes=[
            pltpu.VMEM((bw * s, num_heads * hs), x.dtype),
            pltpu.VMEM(
                (bw * s, 3 * num_heads * hs) if align == "scratch"
                else (8, 128),
                x.dtype,
            ),
        ],
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


# ---------------------------------------------------------------------------
# Multi-block stage kernel: a run of consecutive same-shape windowed blocks
# (dim == dim_out, same window side) is row-parallel END TO END — windows
# never exchange information across such blocks — so a grid step can carry
# its ~1024 rows through SEVERAL blocks back-to-back while they are VMEM-
# resident. Amortizes the per-step fixed costs (DMA ramp, LN/attention
# pipeline bubbles) that dominate the small-C stages.
# ---------------------------------------------------------------------------


def _stage_kernel(
    x_ref,  # [bw, S, C]
    *args,  # 12*nb param refs, o_ref, att_ref, qkv_ref
    nblocks: int,
    num_heads: int,
    head_dim: int,
    head_pad: int,
    tokens: int,
    bw: int,
    gw: int,
    act: str,
    eps: float,
    align: str,
):
    prefs = args[: 12 * nblocks]
    o_ref, att_ref, qkv_ref = args[12 * nblocks :]
    rows = bw * tokens
    x = x_ref[...].reshape(rows, x_ref.shape[-1])
    for b in range(nblocks):
        x = _block_body(
            x, prefs[12 * b : 12 * (b + 1)], att_ref, qkv_ref,
            num_heads=num_heads, head_dim=head_dim, head_pad=head_pad,
            tokens=tokens, gw=gw, act=act, eps=eps, align=align,
        )
    o_ref[...] = x.reshape(o_ref.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def fused_hiera_stage(
    x: jnp.ndarray,  # [N, S, C] window-major tokens
    params_list: tuple,  # tuple of per-block 12-tuples (fused_hiera_block
    #                      ordering)
    num_heads: int,
    head_dim: int,
    head_pad: int = 0,
    interpret: bool = False,
    act: str = "gelu_exact",
    eps: float = 1e-6,
    align_qkv: bool = False,
) -> jnp.ndarray:
    """A run of ``len(params_list)`` consecutive whole blocks in ONE Pallas
    call (each grid step advances its rows through all of them). Math is
    identical to folding fused_hiera_block over the list."""
    return _stage_forward(
        x, params_list, num_heads, head_dim, head_pad, interpret, act, eps,
        align_qkv,
    )


def _stage_forward(x, params_list, num_heads, head_dim, head_pad, interpret,
                   act, eps, align_qkv):
    n, s, c = x.shape
    hp = head_pad or head_dim
    if not interpret and jax.default_backend() != "tpu":
        for p in params_list:
            x = _reference(x, p, num_heads, head_dim, hp, act, eps)
        return x
    nb = len(params_list)
    bw, gw = _pick_bw(n, s, num_heads)
    align, hs = _resolve_align(align_qkv, hp)

    def prep(p):
        (ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b, w1, b1, w2,
         b2) = p
        wqkv, bqkv, wproj = _pad_weights_for_align(
            align, wqkv, bqkv, wproj, num_heads, hp, hs, c
        )
        f32 = jnp.float32
        vec = lambda a, dt=None: (
            a.reshape(1, -1).astype(dt) if dt else a.reshape(1, -1)
        )
        return (
            vec(ln1_s, f32), vec(ln1_b, f32),
            wqkv.astype(x.dtype), vec(bqkv, f32),
            wproj.astype(x.dtype), vec(bproj, f32),
            vec(ln2_s, f32), vec(ln2_b, f32),
            w1.astype(x.dtype), vec(b1, f32),
            w2.astype(x.dtype), vec(b2, f32),
        )

    flat = [a for p in params_list for a in prep(p)]
    kernel = functools.partial(
        _stage_kernel, nblocks=nb, num_heads=num_heads, head_dim=head_dim,
        head_pad=hp, tokens=s, bw=bw, gw=gw, act=act, eps=eps, align=align,
    )
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    return pl.pallas_call(
        kernel,
        grid=(n // bw,),
        in_specs=[pl.BlockSpec((bw, s, c), lambda i: (i, 0, 0))]
        + [full(a.shape) for a in flat],
        out_specs=pl.BlockSpec((bw, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, s, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bw * s, num_heads * hs), x.dtype),
            pltpu.VMEM(
                (bw * s, 3 * num_heads * hs) if align == "scratch"
                else (8, 128),
                x.dtype,
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=interpret,
    )(x, *flat)


def _stage_fwd(x, params_list, num_heads, head_dim, head_pad, interpret, act,
               eps, align_qkv):
    return (
        fused_hiera_stage(
            x, params_list, num_heads, head_dim, head_pad, interpret, act,
            eps, align_qkv,
        ),
        (x, params_list),
    )


def _stage_bwd(num_heads, head_dim, head_pad, interpret, act, eps, align_qkv,
               res, g):
    x, params_list = res
    hp = head_pad or head_dim

    def ref_chain(xx, pl_):
        for p in pl_:
            xx = _reference(xx, p, num_heads, head_dim, hp, act, eps)
        return xx

    _, vjp = jax.vjp(ref_chain, x, params_list)
    return vjp(g)


fused_hiera_stage.defvjp(_stage_fwd, _stage_bwd)


# ---------------------------------------------------------------------------
# Partial fusions for the blocks the whole-block kernel cannot take
# (q-pooling and global-attention blocks, 6 of Hiera-L's 48): the attention
# stays outside (XLA pool + window attention / Pallas flash), but the
# LN1→qkv front and the proj→residual→LN2→MLP tail each collapse into one
# kernel — 7 HBM round-trips become 3.
# ---------------------------------------------------------------------------


def _ln_matmul_kernel(
    x_ref,  # [bw, S, C]
    ln_s_ref, ln_b_ref,  # [1, C] f32
    w_ref, b_ref,  # [C, D], [1, D]
    o_ref,  # [bw, S, D]
    *,
    eps: float,
):
    rows = x_ref.shape[0] * x_ref.shape[1]
    x = x_ref[...].reshape(rows, x_ref.shape[-1])
    xn = _layernorm(
        x.astype(jnp.float32), ln_s_ref[0, :], ln_b_ref[0, :], eps
    ).astype(x_ref.dtype)
    o = (
        jax.lax.dot_general(
            xn, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        + b_ref[0, :]
    ).astype(o_ref.dtype)
    o_ref[...] = o.reshape(o_ref.shape)


def _ln_matmul_reference(x, ln_s, ln_b, w, b, eps):
    xn = _layernorm(x.astype(jnp.float32), ln_s, ln_b, eps).astype(x.dtype)
    return (xn @ w.astype(x.dtype) + b).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_ln_matmul(
    x: jnp.ndarray,  # [N, S, C]
    ln_s, ln_b, w, b,
    interpret: bool = False,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """LayerNorm + matmul in one pass (the LN1→qkv/proj front of a block).
    Forward Pallas on TPU; VJP recomputes through the XLA reference (SAM2's
    image encoder is frozen in reference training, so the backward is cold
    path)."""
    return _ln_matmul_forward(x, ln_s, ln_b, w, b, interpret, eps)


def _ln_matmul_fwd(x, ln_s, ln_b, w, b, interpret, eps):
    return (
        fused_ln_matmul(x, ln_s, ln_b, w, b, interpret, eps),
        (x, ln_s, ln_b, w, b),
    )


def _ln_matmul_bwd(interpret, eps, res, g):
    x, ln_s, ln_b, w, b = res
    _, vjp = jax.vjp(
        lambda *a: _ln_matmul_reference(*a, eps), x, ln_s, ln_b, w, b
    )
    return vjp(g)


def _ln_matmul_forward(x, ln_s, ln_b, w, b, interpret, eps):
    n, s, c = x.shape
    d = w.shape[1]
    if not interpret and jax.default_backend() != "tpu":
        return _ln_matmul_reference(x, ln_s, ln_b, w, b, eps)
    bw = 1
    while bw * 2 * s <= 1024 and n % (bw * 2) == 0:
        bw *= 2
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_ln_matmul_kernel, eps=eps),
        grid=(n // bw,),
        in_specs=[
            pl.BlockSpec((bw, s, c), lambda i: (i, 0, 0)),
            full((1, c)), full((1, c)),
            full(w.shape), full((1, d)),
        ],
        out_specs=pl.BlockSpec((bw, s, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, s, d), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(
        x,
        ln_s.reshape(1, -1).astype(f32), ln_b.reshape(1, -1).astype(f32),
        w.astype(x.dtype), b.reshape(1, -1).astype(f32),
    )


fused_ln_matmul.defvjp(_ln_matmul_fwd, _ln_matmul_bwd)


def _tail_kernel(
    sc_ref,  # [bw, S, C] shortcut (residual input)
    att_ref,  # [bw, S, A] attention output (pre-proj)
    wp_ref, bp_ref,  # [A, C], [1, C]
    ln2_s_ref, ln2_b_ref,  # [1, C]
    w1_ref, b1_ref,  # [C, M], [1, M]
    w2_ref, b2_ref,  # [M, C], [1, C]
    o_ref,  # [bw, S, C]
    *,
    act: str,
    eps: float,
):
    rows = sc_ref.shape[0] * sc_ref.shape[1]
    dtype = sc_ref.dtype
    sc = sc_ref[...].reshape(rows, sc_ref.shape[-1])
    att = att_ref[...].reshape(rows, att_ref.shape[-1])
    x1 = sc + (
        jax.lax.dot_general(
            att, wp_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        + bp_ref[0, :]
    ).astype(dtype)
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
    hmid = _ACTS[act](hmid).astype(dtype)
    mlp = (
        jax.lax.dot_general(
            hmid, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        + b2_ref[0, :]
    ).astype(dtype)
    o_ref[...] = (x1 + mlp).reshape(o_ref.shape)


def _tail_reference(shortcut, att, params, act, eps):
    wproj, bproj, ln2_s, ln2_b, w1, b1, w2, b2 = params
    dtype = shortcut.dtype
    x1 = shortcut + (att @ wproj.astype(dtype) + bproj).astype(dtype)
    xm = _layernorm(x1.astype(jnp.float32), ln2_s, ln2_b, eps).astype(dtype)
    h = _ACTS[act]((xm @ w1.astype(dtype) + b1).astype(jnp.float32))
    return x1 + (h.astype(dtype) @ w2.astype(dtype) + b2).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_block_tail(
    shortcut: jnp.ndarray,  # [N, S, C]
    att: jnp.ndarray,  # [N, S, A] pre-proj attention output
    params: tuple,  # (wproj, bproj, ln2_s, ln2_b, w1, b1, w2, b2)
    interpret: bool = False,
    act: str = "gelu_exact",
    eps: float = 1e-6,
) -> jnp.ndarray:
    """proj → +residual → LN2 → MLP → +residual in one pass (a block's tail
    after externally-computed attention). Forward Pallas on TPU; VJP via
    the XLA reference."""
    return _tail_forward(shortcut, att, params, interpret, act, eps)


def _tail_fwd(shortcut, att, params, interpret, act, eps):
    return (
        fused_block_tail(shortcut, att, params, interpret, act, eps),
        (shortcut, att, params),
    )


def _tail_bwd(interpret, act, eps, res, g):
    shortcut, att, params = res
    _, vjp = jax.vjp(
        lambda s_, a_, p_: _tail_reference(s_, a_, p_, act, eps),
        shortcut, att, params,
    )
    return vjp(g)


def _tail_forward(shortcut, att, params, interpret, act, eps):
    import os

    wproj, bproj, ln2_s, ln2_b, w1, b1, w2, b2 = params
    n, s, c = shortcut.shape
    a = att.shape[-1]
    m = w1.shape[1]
    if not interpret and jax.default_backend() != "tpu":
        return _tail_reference(shortcut, att, params, act, eps)
    bw = 1
    while bw * 2 * s <= 1024 and n % (bw * 2) == 0:
        bw *= 2
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    f32 = jnp.float32
    vec = lambda x_: x_.reshape(1, -1).astype(f32)
    return pl.pallas_call(
        functools.partial(_tail_kernel, act=act, eps=eps),
        grid=(n // bw,),
        in_specs=[
            pl.BlockSpec((bw, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((bw, s, a), lambda i: (i, 0, 0)),
            full(wproj.shape), full((1, c)),
            full((1, c)), full((1, c)),
            full(w1.shape), full((1, m)),
            full(w2.shape), full((1, c)),
        ],
        out_specs=pl.BlockSpec((bw, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, s, c), shortcut.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(
        shortcut, att,
        wproj.astype(shortcut.dtype), vec(bproj),
        vec(ln2_s), vec(ln2_b),
        w1.astype(shortcut.dtype), vec(b1),
        w2.astype(shortcut.dtype), vec(b2),
    )


fused_block_tail.defvjp(_tail_fwd, _tail_bwd)


# ---------------------------------------------------------------------------
# Fused q-pool whole-block kernel: the 3 stage-transition blocks (Hiera-L
# i = 2, 8, 44; reference sam2.py:1085-1131 with q_stride set). Unlike the
# measured round-2 dead end (pooled q zero-padded back to S rows through the
# windowed kernel), this computes ONLY the sq = S/(sy*sx) pooled q rows:
# LN1 → front matmul (qkv + folded dim-change shortcut proj) → in-kernel
# 2x2 window max-pool of q and the shortcut → grouped block-diagonal
# attention (sq q rows vs S kv rows per window) → proj → +pooled shortcut →
# LN2 → MLP, one HBM round-trip for the activations.
# ---------------------------------------------------------------------------


def _qpool_kernel(
    x_ref,  # [bw, S, Cin]
    ln1_s_ref, ln1_b_ref,  # [1, Cin] f32
    wf_ref, bf_ref,  # [Cin, 3*H*hp + Cout], [1, ...] (qkv ++ shortcut proj)
    wproj_ref, bproj_ref,  # [H*hp, Cout], [1, Cout]
    ln2_s_ref, ln2_b_ref,  # [1, Cout]
    w1_ref, b1_ref,  # [Cout, M], [1, M]
    w2_ref, b2_ref,  # [M, Cout], [1, Cout]
    o_ref,  # [bw, sq, Cout]
    att_ref,  # scratch [bw*sq, H*hp]
    *,
    num_heads: int,
    head_dim: int,
    head_pad: int,
    ws: int,  # window side of the INPUT tokens (S = ws*ws)
    sy: int,
    sx: int,
    bw: int,
    gw: int,  # windows per block-diagonal attention group
    act: str,
    eps: float,
):
    s = ws * ws
    sq = (ws // sy) * (ws // sx)
    rows = bw * s
    hp = head_pad
    hw = num_heads * hp
    cout = o_ref.shape[-1]
    scale = head_dim ** -0.5
    dtype = x_ref.dtype

    x = x_ref[...].reshape(rows, x_ref.shape[-1])
    xn = _layernorm(
        x.astype(jnp.float32), ln1_s_ref[0, :], ln1_b_ref[0, :], eps
    ).astype(dtype)
    front = (
        jax.lax.dot_general(
            xn, wf_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        + bf_ref[0, :]
    ).astype(dtype)

    # window-interior max pool of q and the shortcut: tokens are x-major
    # within each window, so both pools are leading-dim reshapes + max
    # (last dim stays in lanes — Mosaic-legal)
    def pool(v):  # [rows, D] -> [bw*sq, D]
        d = v.shape[-1]
        v6 = v.reshape(bw, ws // sy, sy, ws // sx, sx, d)
        return jnp.max(jnp.max(v6, axis=4), axis=2).reshape(bw * sq, d)

    qp = pool(front[:, :hw])  # [bw*sq, H*hp]
    sc = pool(front[:, 3 * hw :])  # [bw*sq, Cout] pooled dim-change shortcut

    grows_q = gw * sq
    grows_k = gw * s
    if gw > 1:
        win_r = jax.lax.broadcasted_iota(jnp.int32, (grows_q, grows_k), 0) // sq
        win_c = jax.lax.broadcasted_iota(jnp.int32, (grows_q, grows_k), 1) // s
        same = win_r == win_c
    for g in range(bw // gw):
        slq = slice(g * grows_q, (g + 1) * grows_q)
        slk = slice(g * grows_k, (g + 1) * grows_k)
        for h in range(num_heads):
            q = (
                qp[slq, h * hp : (h + 1) * hp].astype(jnp.float32)
                * (scale * _LOG2E)
            ).astype(dtype)
            k = front[slk, hw + h * hp : hw + (h + 1) * hp]
            v = front[slk, 2 * hw + h * hp : 2 * hw + (h + 1) * hp]
            sdot = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            if gw > 1:
                sdot = jnp.where(same, sdot, _NEG_INF)
            m = jnp.max(sdot, axis=-1, keepdims=True)
            p = jnp.exp2((sdot - m).astype(dtype))
            denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            o = jnp.dot(
                p, v, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ) / denom
            att_ref[slq, h * hp : (h + 1) * hp] = o.astype(dtype)

    x1 = sc + (
        jax.lax.dot_general(
            att_ref[...], wproj_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        + bproj_ref[0, :]
    ).astype(dtype)
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
    hmid = _ACTS[act](hmid).astype(dtype)
    mlp = (
        jax.lax.dot_general(
            hmid, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        + b2_ref[0, :]
    ).astype(dtype)
    o_ref[...] = (x1 + mlp).reshape(o_ref.shape)


def _qpool_reference(
    x, params, num_heads, head_dim, head_pad, q_stride, act="gelu_exact",
    eps=1e-6,
):
    """XLA reference with identical math (MultiScaleBlock with q_stride and
    a dim-change shortcut proj folded into the front matmul)."""
    (ln1_s, ln1_b, wf, bf, wproj, bproj, ln2_s, ln2_b, w1, b1, w2,
     b2) = params
    n, s, _ = x.shape
    ws = int(round(s ** 0.5))
    sy, sx = q_stride
    sq = (ws // sy) * (ws // sx)
    hp = head_pad
    hw = num_heads * hp
    dtype = x.dtype
    xn = _layernorm(x.astype(jnp.float32), ln1_s, ln1_b, eps).astype(dtype)
    front = (xn @ wf.astype(dtype) + bf).astype(dtype)

    def pool(v):  # [n, s, d] -> [n, sq, d]
        d = v.shape[-1]
        v6 = v.reshape(n, ws // sy, sy, ws // sx, sx, d)
        return jnp.max(jnp.max(v6, axis=4), axis=2).reshape(n, sq, d)

    qp = pool(front[..., :hw]).reshape(n, sq, num_heads, hp)
    sc = pool(front[..., 3 * hw :])
    kh = front[..., hw : 2 * hw].reshape(n, s, num_heads, hp)
    vh = front[..., 2 * hw : 3 * hw].reshape(n, s, num_heads, hp)
    logits = (
        jnp.einsum("nqhd,nkhd->nhqk", qp, kh,
                   preferred_element_type=jnp.float32)
        * head_dim ** -0.5
    )
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum(
        "nhqk,nkhd->nqhd", probs.astype(dtype), vh,
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    x1 = sc + (o.reshape(n, sq, hw) @ wproj.astype(dtype) + bproj).astype(dtype)
    xm = _layernorm(x1.astype(jnp.float32), ln2_s, ln2_b, eps).astype(dtype)
    h = _ACTS[act]((xm @ w1.astype(dtype) + b1).astype(jnp.float32))
    return x1 + (h.astype(dtype) @ w2.astype(dtype) + b2).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def fused_qpool_block(
    x: jnp.ndarray,  # [N, S, Cin] window-major tokens, S = ws²
    params: tuple,  # (ln1_s, ln1_b, wfront, bfront, wproj, bproj,
    #                 ln2_s, ln2_b, w1, b1, w2, b2) — wfront = [qkv ++ sc]
    num_heads: int,
    head_dim: int,
    head_pad: int = 0,
    q_stride: tuple = (2, 2),
    interpret: bool = False,
    act: str = "gelu_exact",
    eps: float = 1e-6,
) -> jnp.ndarray:
    """One full q-pooling stage-transition block → [N, S/(sy·sx), Cout].
    Forward Pallas on TPU; VJP recomputes through the XLA reference (the
    SAM2 image encoder is frozen in reference training)."""
    return _qpool_forward(
        x, params, num_heads, head_dim, head_pad, q_stride, interpret, act,
        eps,
    )


def _qpool_forward(
    x, params, num_heads, head_dim, head_pad, q_stride, interpret, act, eps
):
    n, s, cin = x.shape
    hp = head_pad or head_dim
    if not interpret and jax.default_backend() != "tpu":
        return _qpool_reference(
            x, params, num_heads, head_dim, hp, q_stride, act, eps
        )
    (ln1_s, ln1_b, wf, bf, wproj, bproj, ln2_s, ln2_b, w1, b1, w2,
     b2) = params
    ws = int(round(s ** 0.5))
    assert ws * ws == s, s
    sy, sx = q_stride
    sq = (ws // sy) * (ws // sx)
    cout = wproj.shape[1]
    mlp_dim = w1.shape[1]
    # ~128 q rows per score group, ~1024 kv rows per grid step, ≤64
    # unrolled attention dot-pairs per step (same budget as _pick_bw)
    gw = max(1, 128 // sq)
    while gw > 1 and n % gw != 0:
        gw //= 2
    bw = gw
    while (
        bw * 2 * s <= 1024
        and n % (bw * 2) == 0
        and (bw * 2 // gw) * num_heads <= 64
    ):
        bw *= 2
    gw = min(gw, bw)
    kernel = functools.partial(
        _qpool_kernel, num_heads=num_heads, head_dim=head_dim, head_pad=hp,
        ws=ws, sy=sy, sx=sx, bw=bw, gw=gw, act=act, eps=eps,
    )
    f32 = jnp.float32
    vec = lambda a: a.reshape(1, -1).astype(f32)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    return pl.pallas_call(
        kernel,
        grid=(n // bw,),
        in_specs=[
            pl.BlockSpec((bw, s, cin), lambda i: (i, 0, 0)),
            full((1, cin)), full((1, cin)),
            full(wf.shape), full((1, wf.shape[1])),
            full(wproj.shape), full((1, cout)),
            full((1, cout)), full((1, cout)),
            full(w1.shape), full((1, mlp_dim)),
            full(w2.shape), full((1, cout)),
        ],
        out_specs=pl.BlockSpec((bw, sq, cout), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, sq, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bw * sq, num_heads * hp), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=interpret,
    )(
        x,
        vec(ln1_s), vec(ln1_b),
        wf.astype(x.dtype), vec(bf),
        wproj.astype(x.dtype), vec(bproj),
        vec(ln2_s), vec(ln2_b),
        w1.astype(x.dtype), vec(b1),
        w2.astype(x.dtype), vec(b2),
    )


def _qpool_fwd(x, params, num_heads, head_dim, head_pad, q_stride, interpret,
               act, eps):
    return (
        fused_qpool_block(
            x, params, num_heads, head_dim, head_pad, q_stride, interpret,
            act, eps,
        ),
        (x, params),
    )


def _qpool_bwd(num_heads, head_dim, head_pad, q_stride, interpret, act, eps,
               res, g):
    x, params = res
    hp = head_pad or head_dim
    _, vjp = jax.vjp(
        lambda xx, pp: _qpool_reference(
            xx, pp, num_heads, head_dim, hp, q_stride, act, eps
        ),
        x, params,
    )
    return vjp(g)


fused_qpool_block.defvjp(_qpool_fwd, _qpool_bwd)


def _fwd(x, params, num_heads, head_dim, head_pad, interpret, act, eps,
         align_qkv):
    return (
        _forward(
            x, params, num_heads, head_dim, head_pad, interpret, act, eps,
            align_qkv,
        ),
        (x, params),
    )


def _bwd(num_heads, head_dim, head_pad, interpret, act, eps, align_qkv,
         res, g):
    x, params = res
    hp = head_pad or head_dim
    _, vjp = jax.vjp(
        lambda xx, pp: _reference(xx, pp, num_heads, head_dim, hp, act, eps),
        x, params,
    )
    return vjp(g)


fused_hiera_block.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# W8A8 whole-block kernel: same block, int8 weights AND per-row int8-
# quantized activations, so the four dense dots run s8×s8→s32 on the MXU
# (1.22× the bf16 dot rate through XLA on v5e, PERF.md r4 — and here the
# quantize runs on VMEM-resident values with the rescale fused into the
# bias add, removing the XLA path's extra HBM traffic). Attention stays
# bf16 (72-lane contractions, score range). Inference path of the frozen
# towers; the non-TPU fallback goes through the quantized XLA reference
# below, and the grad path (if ever taken) is a straight-through estimator
# through the dequantized float reference (custom_vjp at the bottom of
# this file).
# ---------------------------------------------------------------------------

def _quant_rows_f32(x32):
    """f32 [rows, d] → (int8 [rows, d], f32 scales [rows, 1])."""
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s = jnp.maximum(amax * (1.0 / 127.0), 1e-8)
    return jnp.round(x32 / s).astype(jnp.int8), s


def _w8a8_body(x, refs, att_ref, *, num_heads, head_dim, head_pad,
               tokens, gw, act, eps):
    """Whole pre-LN block on resident [rows, C] bf16 values; packed
    (align=off) head layout (slots of head_pad lanes when the converter
    zero-pads heads, else head_dim)."""
    (ln1_s_ref, ln1_b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
     wproj_ref, sproj_ref, bproj_ref, ln2_s_ref, ln2_b_ref,
     w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref) = refs
    rows = x.shape[0]
    hp = head_pad or head_dim
    hw = num_heads * hp
    scale = head_dim ** -0.5
    dtype = x.dtype

    def qdot(q, xs, w_ref, s_ref, b_ref):
        acc = jax.lax.dot_general(
            q, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * xs * s_ref[0, :] + b_ref[0, :]

    xn = _layernorm(x.astype(jnp.float32), ln1_s_ref[0, :], ln1_b_ref[0, :],
                    eps)
    q1, s1x = _quant_rows_f32(xn)
    qkv = qdot(q1, s1x, wqkv_ref, sqkv_ref, bqkv_ref).astype(dtype)

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
            )
            if gw > 1:
                s = jnp.where(same, s, _NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2((s - m).astype(dtype))
            denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            o = jnp.dot(p, v, preferred_element_type=jnp.float32) / denom
            att_ref[sl, h * hp : (h + 1) * hp] = o.astype(dtype)

    qa, sa = _quant_rows_f32(att_ref[...].astype(jnp.float32))
    att = qdot(qa, sa, wproj_ref, sproj_ref, bproj_ref).astype(dtype)
    x1 = x + att

    xm = _layernorm(x1.astype(jnp.float32), ln2_s_ref[0, :], ln2_b_ref[0, :],
                    eps)
    qm, sm = _quant_rows_f32(xm)
    hmid = _ACTS[act](qdot(qm, sm, w1_ref, s1_ref, b1_ref))
    qh, sh = _quant_rows_f32(hmid)
    mlp = qdot(qh, sh, w2_ref, s2_ref, b2_ref).astype(dtype)
    return x1 + mlp


def _w8a8_kernel(x_ref, *args, num_heads, head_dim, head_pad, tokens, bw,
                 gw, act, eps):
    refs, (o_ref, att_ref) = args[:16], args[16:]
    rows = bw * tokens
    x = x_ref[...].reshape(rows, x_ref.shape[-1])
    out = _w8a8_body(
        x, refs, att_ref, num_heads=num_heads, head_dim=head_dim,
        head_pad=head_pad, tokens=tokens, gw=gw, act=act, eps=eps,
    )
    o_ref[...] = out.reshape(o_ref.shape)


def w8a8_reference(x, params, num_heads, head_dim, act="gelu_tanh",
                   eps=1e-6, head_pad=0):
    """XLA reference with the kernel's exact quantization points (per-row
    int8 from the f32 LN outputs / f32 attention outputs / f32 GELU
    outputs)."""
    (ln1_s, ln1_b, wqkv, sqkv, bqkv, wproj, sproj, bproj, ln2_s, ln2_b,
     w1, s1, b1, w2, s2, b2) = params
    n, s, c = x.shape
    hp = head_pad or head_dim
    dtype = x.dtype

    def qdot(x32, w, ws, b):
        q, xs = _quant_rows_f32(x32)
        acc = jax.lax.dot_general(
            q, w, (((q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (
            acc.astype(jnp.float32) * xs * ws.astype(jnp.float32)[None, :]
            + b.astype(jnp.float32)[None, :]
        )

    xn = _layernorm(x.astype(jnp.float32), ln1_s, ln1_b, eps)
    qkv = qdot(xn.reshape(n * s, c), wqkv, sqkv, bqkv).reshape(
        n, s, -1
    ).astype(dtype)
    hw = num_heads * hp
    qh = qkv[..., :hw].reshape(n, s, num_heads, hp)
    kh = qkv[..., hw : 2 * hw].reshape(n, s, num_heads, hp)
    vh = qkv[..., 2 * hw :].reshape(n, s, num_heads, hp)
    logits = (
        jnp.einsum("nqhd,nkhd->nhqk", qh, kh,
                   preferred_element_type=jnp.float32)
        * head_dim ** -0.5
    )
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum(
        "nhqk,nkhd->nqhd", probs.astype(dtype), vh,
        preferred_element_type=jnp.float32,
    ).reshape(n, s, hw)
    att = qdot(o.reshape(n * s, hw), wproj, sproj, bproj).reshape(n, s, c)
    x1 = x + att.astype(dtype)
    xm = _layernorm(x1.astype(jnp.float32), ln2_s, ln2_b, eps)
    h = _ACTS[act](qdot(xm.reshape(n * s, c), w1, s1, b1))
    mlp = qdot(h, w2, s2, b2).reshape(n, s, c)
    return x1 + mlp.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def fused_block_w8a8(
    x: jnp.ndarray,  # [N, S, C] window-major tokens (SigLIP: one
    #                   whole-sequence window per image)
    params: tuple,  # (ln1_s, ln1_b, wqkv_q, sqkv, bqkv, wproj_q, sproj,
    #                 bproj, ln2_s, ln2_b, w1_q, s1, b1, w2_q, s2, b2)
    num_heads: int,
    head_dim: int,
    head_pad: int = 0,
    interpret: bool = False,
    act: str = "gelu_tanh",
    eps: float = 1e-6,
) -> jnp.ndarray:
    """W8A8 whole-block kernel (packed heads, no q-pool, dim==dim_out)."""
    n, s, c = x.shape
    if not interpret and jax.default_backend() != "tpu":
        return w8a8_reference(
            x, params, num_heads, head_dim, act, eps, head_pad
        )
    (ln1_s, ln1_b, wqkv, sqkv, bqkv, wproj, sproj, bproj, ln2_s, ln2_b,
     w1, s1, b1, w2, s2, b2) = params
    mlp_dim = w1.shape[1]
    bw, gw = _pick_bw(n, s, num_heads)
    kernel = functools.partial(
        _w8a8_kernel, num_heads=num_heads, head_dim=head_dim,
        head_pad=head_pad, tokens=s, bw=bw, gw=gw, act=act, eps=eps,
    )
    f32 = jnp.float32

    def vec(a, dt=f32):
        return a.reshape(1, -1).astype(dt)

    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    return pl.pallas_call(
        kernel,
        grid=(n // bw,),
        in_specs=[
            pl.BlockSpec((bw, s, c), lambda i: (i, 0, 0)),
            full((1, c)), full((1, c)),
            full(wqkv.shape), full((1, wqkv.shape[1])), full((1, wqkv.shape[1])),
            full(wproj.shape), full((1, c)), full((1, c)),
            full((1, c)), full((1, c)),
            full(w1.shape), full((1, mlp_dim)), full((1, mlp_dim)),
            full(w2.shape), full((1, c)), full((1, c)),
        ],
        out_specs=pl.BlockSpec((bw, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, s, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM(
                (bw * s, num_heads * (head_pad or head_dim)), x.dtype
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20,
        ),
        interpret=interpret,
    )(
        x,
        vec(ln1_s), vec(ln1_b),
        wqkv, vec(sqkv), vec(bqkv),
        wproj, vec(sproj), vec(bproj),
        vec(ln2_s), vec(ln2_b),
        w1, vec(s1), vec(b1),
        w2, vec(s2), vec(b2),
    )


def _w8a8_fwd(x, params, num_heads, head_dim, head_pad, interpret, act, eps):
    return (
        fused_block_w8a8(
            x, params, num_heads, head_dim, head_pad, interpret, act, eps
        ),
        (x, params),
    )


def _w8a8_bwd(num_heads, head_dim, head_pad, interpret, act, eps, res, g):
    # Grad path (quant_vision under training, e.g. a LoRA/adapter run that
    # leaves the towers int8): straight-through estimator — backward runs
    # the float reference block on DEQUANTIZED weights (round() is
    # piecewise-constant, so differentiating the quantized reference would
    # zero most of the gradient; the STE of the dequantized matmul is the
    # standard QAT choice) and keeps pallas_call off the backward trace
    # (which it cannot lower). int8 weight leaves get float0 cotangents;
    # x, LN params, biases, and scales get real gradients.
    x, params = res

    def deq_ref(xx, pp):
        (ln1_s, ln1_b, wqkv, sqkv, bqkv, wproj, sproj, bproj, ln2_s, ln2_b,
         w1, s1, b1, w2, s2, b2) = pp
        f32 = jnp.float32
        deq = lambda w, s: (w.astype(f32) * s.astype(f32)[None, :]).astype(
            xx.dtype
        )
        fp = (ln1_s, ln1_b, deq(wqkv, sqkv), bqkv.astype(xx.dtype),
              deq(wproj, sproj), bproj.astype(xx.dtype), ln2_s, ln2_b,
              deq(w1, s1), b1.astype(xx.dtype), deq(w2, s2),
              b2.astype(xx.dtype))
        return _reference(
            xx, fp, num_heads, head_dim, head_pad or head_dim, act, eps
        )

    _, vjp = jax.vjp(deq_ref, x, params)
    return vjp(g)


fused_block_w8a8.defvjp(_w8a8_fwd, _w8a8_bwd)


# ---------------------------------------------------------------------------
# W8A8 variants of the special-block kernels (q-pool / global / dim-change —
# Hiera-L i = 2, 8, 23, 33, 43, 44; reference sam2.py:1085-1131). Round 4
# left these 6 blocks on unfused XLA W8A8Dense while the 42 plain windowed
# blocks got the fused int8 whole-block kernel; these give them the same
# fused structure (one/three HBM round-trips, VMEM-resident quantize +
# rescale) with s8×s8→s32 MXU dots. Quantization points match W8A8Dense:
# per-row int8 off the f32 LN/attention/GELU outputs.
# ---------------------------------------------------------------------------


def _qdot_ref(x32, w_q, ws, b):
    """XLA-reference W8A8 dot with the kernels' exact quantize points."""
    q, xs = _quant_rows_f32(x32.astype(jnp.float32).reshape(-1, x32.shape[-1]))
    acc = jax.lax.dot_general(
        q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = (
        acc.astype(jnp.float32) * xs * ws.astype(jnp.float32)[None, :]
        + b.astype(jnp.float32)[None, :]
    )
    return out.reshape(x32.shape[:-1] + (w_q.shape[1],))


def _qpool_w8a8_kernel(
    x_ref,  # [bw, S, Cin]
    ln1_s_ref, ln1_b_ref,  # [1, Cin] f32
    wf_ref, sf_ref, bf_ref,  # int8 [Cin, 3*H*hp + Cout], scales/bias [1, .]
    wp_ref, sp_ref, bp_ref,  # int8 [H*hp, Cout], [1, Cout] ×2
    ln2_s_ref, ln2_b_ref,  # [1, Cout]
    w1_ref, s1_ref, b1_ref,  # int8 [Cout, M], [1, M] ×2
    w2_ref, s2_ref, b2_ref,  # int8 [M, Cout], [1, Cout] ×2
    o_ref,  # [bw, sq, Cout]
    att_ref,  # scratch [bw*sq, H*hp]
    *,
    num_heads: int,
    head_dim: int,
    head_pad: int,
    ws: int,
    sy: int,
    sx: int,
    bw: int,
    gw: int,
    act: str,
    eps: float,
):
    s = ws * ws
    sq = (ws // sy) * (ws // sx)
    rows = bw * s
    hp = head_pad
    hw = num_heads * hp
    scale = head_dim ** -0.5
    dtype = x_ref.dtype

    def qdot(q, xs, w_ref_, s_ref_, b_ref_):
        acc = jax.lax.dot_general(
            q, w_ref_[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * xs * s_ref_[0, :] + b_ref_[0, :]

    x = x_ref[...].reshape(rows, x_ref.shape[-1])
    xn = _layernorm(
        x.astype(jnp.float32), ln1_s_ref[0, :], ln1_b_ref[0, :], eps
    )
    q1, s1x = _quant_rows_f32(xn)
    front = qdot(q1, s1x, wf_ref, sf_ref, bf_ref).astype(dtype)

    def pool(v):  # [rows, D] -> [bw*sq, D]
        d = v.shape[-1]
        v6 = v.reshape(bw, ws // sy, sy, ws // sx, sx, d)
        return jnp.max(jnp.max(v6, axis=4), axis=2).reshape(bw * sq, d)

    qp = pool(front[:, :hw])
    sc = pool(front[:, 3 * hw :])

    grows_q = gw * sq
    grows_k = gw * s
    if gw > 1:
        win_r = jax.lax.broadcasted_iota(jnp.int32, (grows_q, grows_k), 0) // sq
        win_c = jax.lax.broadcasted_iota(jnp.int32, (grows_q, grows_k), 1) // s
        same = win_r == win_c
    for g in range(bw // gw):
        slq = slice(g * grows_q, (g + 1) * grows_q)
        slk = slice(g * grows_k, (g + 1) * grows_k)
        for h in range(num_heads):
            q = (
                qp[slq, h * hp : (h + 1) * hp].astype(jnp.float32)
                * (scale * _LOG2E)
            ).astype(dtype)
            k = front[slk, hw + h * hp : hw + (h + 1) * hp]
            v = front[slk, 2 * hw + h * hp : 2 * hw + (h + 1) * hp]
            sdot = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if gw > 1:
                sdot = jnp.where(same, sdot, _NEG_INF)
            m = jnp.max(sdot, axis=-1, keepdims=True)
            p = jnp.exp2((sdot - m).astype(dtype))
            denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            o = jnp.dot(p, v, preferred_element_type=jnp.float32) / denom
            att_ref[slq, h * hp : (h + 1) * hp] = o.astype(dtype)

    qa, sa = _quant_rows_f32(att_ref[...].astype(jnp.float32))
    x1 = sc + qdot(qa, sa, wp_ref, sp_ref, bp_ref).astype(dtype)
    xm = _layernorm(
        x1.astype(jnp.float32), ln2_s_ref[0, :], ln2_b_ref[0, :], eps
    )
    qm, sm = _quant_rows_f32(xm)
    hmid = _ACTS[act](qdot(qm, sm, w1_ref, s1_ref, b1_ref))
    qh, sh = _quant_rows_f32(hmid)
    mlp = qdot(qh, sh, w2_ref, s2_ref, b2_ref).astype(dtype)
    o_ref[...] = (x1 + mlp).reshape(o_ref.shape)


def _qpool_w8a8_reference(
    x, params, num_heads, head_dim, head_pad, q_stride, act="gelu_exact",
    eps=1e-6,
):
    """XLA reference with the kernel's exact quantization points."""
    (ln1_s, ln1_b, wf, sf, bf, wproj, sproj, bproj, ln2_s, ln2_b,
     w1, s1, b1, w2, s2, b2) = params
    n, s, _ = x.shape
    ws = int(round(s ** 0.5))
    sy, sx = q_stride
    sq = (ws // sy) * (ws // sx)
    hp = head_pad
    hw = num_heads * hp
    dtype = x.dtype
    xn = _layernorm(x.astype(jnp.float32), ln1_s, ln1_b, eps)
    front = _qdot_ref(xn, wf, sf, bf).astype(dtype)

    def pool(v):  # [n, s, d] -> [n, sq, d]
        d = v.shape[-1]
        v6 = v.reshape(n, ws // sy, sy, ws // sx, sx, d)
        return jnp.max(jnp.max(v6, axis=4), axis=2).reshape(n, sq, d)

    qp = pool(front[..., :hw]).reshape(n, sq, num_heads, hp)
    sc = pool(front[..., 3 * hw :])
    kh = front[..., hw : 2 * hw].reshape(n, s, num_heads, hp)
    vh = front[..., 2 * hw : 3 * hw].reshape(n, s, num_heads, hp)
    logits = (
        jnp.einsum("nqhd,nkhd->nhqk", qp, kh,
                   preferred_element_type=jnp.float32)
        * head_dim ** -0.5
    )
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum(
        "nhqk,nkhd->nqhd", probs.astype(dtype), vh,
        preferred_element_type=jnp.float32,
    ).reshape(n, sq, hw)
    x1 = sc + _qdot_ref(o, wproj, sproj, bproj).astype(dtype)
    xm = _layernorm(x1.astype(jnp.float32), ln2_s, ln2_b, eps)
    h = _ACTS[act](_qdot_ref(xm, w1, s1, b1))
    return x1 + _qdot_ref(h, w2, s2, b2).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def fused_qpool_block_w8a8(
    x: jnp.ndarray,  # [N, S, Cin] window-major tokens, S = ws²
    params: tuple,  # (ln1_s, ln1_b, wf_q, sf, bf, wproj_q, sproj, bproj,
    #                 ln2_s, ln2_b, w1_q, s1, b1, w2_q, s2, b2)
    num_heads: int,
    head_dim: int,
    head_pad: int = 0,
    q_stride: tuple = (2, 2),
    interpret: bool = False,
    act: str = "gelu_exact",
    eps: float = 1e-6,
) -> jnp.ndarray:
    """W8A8 q-pooling stage-transition block → [N, S/(sy·sx), Cout]."""
    return _qpool_w8a8_forward(
        x, params, num_heads, head_dim, head_pad, q_stride, interpret, act,
        eps,
    )


def _qpool_w8a8_forward(
    x, params, num_heads, head_dim, head_pad, q_stride, interpret, act, eps
):
    n, s, cin = x.shape
    hp = head_pad or head_dim
    if not interpret and jax.default_backend() != "tpu":
        return _qpool_w8a8_reference(
            x, params, num_heads, head_dim, hp, q_stride, act, eps
        )
    (ln1_s, ln1_b, wf, sf, bf, wproj, sproj, bproj, ln2_s, ln2_b,
     w1, s1, b1, w2, s2, b2) = params
    ws = int(round(s ** 0.5))
    assert ws * ws == s, s
    sy, sx = q_stride
    sq = (ws // sy) * (ws // sx)
    cout = wproj.shape[1]
    mlp_dim = w1.shape[1]
    gw = max(1, 128 // sq)
    while gw > 1 and n % gw != 0:
        gw //= 2
    bw = gw
    while (
        bw * 2 * s <= 1024
        and n % (bw * 2) == 0
        and (bw * 2 // gw) * num_heads <= 64
    ):
        bw *= 2
    gw = min(gw, bw)
    kernel = functools.partial(
        _qpool_w8a8_kernel, num_heads=num_heads, head_dim=head_dim,
        head_pad=hp, ws=ws, sy=sy, sx=sx, bw=bw, gw=gw, act=act, eps=eps,
    )
    f32 = jnp.float32
    vec = lambda a: a.reshape(1, -1).astype(f32)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    return pl.pallas_call(
        kernel,
        grid=(n // bw,),
        in_specs=[
            pl.BlockSpec((bw, s, cin), lambda i: (i, 0, 0)),
            full((1, cin)), full((1, cin)),
            full(wf.shape), full((1, wf.shape[1])), full((1, wf.shape[1])),
            full(wproj.shape), full((1, cout)), full((1, cout)),
            full((1, cout)), full((1, cout)),
            full(w1.shape), full((1, mlp_dim)), full((1, mlp_dim)),
            full(w2.shape), full((1, cout)), full((1, cout)),
        ],
        out_specs=pl.BlockSpec((bw, sq, cout), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, sq, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bw * sq, num_heads * hp), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=interpret,
    )(
        x,
        vec(ln1_s), vec(ln1_b),
        wf, vec(sf), vec(bf),
        wproj, vec(sproj), vec(bproj),
        vec(ln2_s), vec(ln2_b),
        w1, vec(s1), vec(b1),
        w2, vec(s2), vec(b2),
    )


def _qpool_w8a8_fwd(x, params, num_heads, head_dim, head_pad, q_stride,
                    interpret, act, eps):
    return (
        fused_qpool_block_w8a8(
            x, params, num_heads, head_dim, head_pad, q_stride, interpret,
            act, eps,
        ),
        (x, params),
    )


def _qpool_w8a8_bwd(num_heads, head_dim, head_pad, q_stride, interpret, act,
                    eps, res, g):
    # STE like fused_block_w8a8: backward through the float q-pool
    # reference on dequantized weights (int8 leaves get float0 cotangents).
    x, params = res

    def deq_ref(xx, pp):
        (ln1_s, ln1_b, wf, sf, bf, wproj, sproj, bproj, ln2_s, ln2_b,
         w1, s1, b1, w2, s2, b2) = pp
        f32 = jnp.float32
        deq = lambda w, s_: (w.astype(f32) * s_.astype(f32)[None, :]).astype(
            xx.dtype
        )
        fp = (ln1_s, ln1_b, deq(wf, sf), bf.astype(xx.dtype),
              deq(wproj, sproj), bproj.astype(xx.dtype), ln2_s, ln2_b,
              deq(w1, s1), b1.astype(xx.dtype), deq(w2, s2),
              b2.astype(xx.dtype))
        return _qpool_reference(
            xx, fp, num_heads, head_dim, head_pad or head_dim, q_stride,
            act, eps,
        )

    _, vjp = jax.vjp(deq_ref, x, params)
    return vjp(g)


fused_qpool_block_w8a8.defvjp(_qpool_w8a8_fwd, _qpool_w8a8_bwd)


def _ln_matmul_w8a8_kernel(
    x_ref,  # [bw, S, C]
    ln_s_ref, ln_b_ref,  # [1, C] f32
    w_ref, s_ref, b_ref,  # int8 [C, D], [1, D] ×2
    o_ref,  # [bw, S, D]
    *,
    eps: float,
):
    rows = x_ref.shape[0] * x_ref.shape[1]
    x = x_ref[...].reshape(rows, x_ref.shape[-1])
    xn = _layernorm(
        x.astype(jnp.float32), ln_s_ref[0, :], ln_b_ref[0, :], eps
    )
    q, xs = _quant_rows_f32(xn)
    acc = jax.lax.dot_general(
        q, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o = (acc.astype(jnp.float32) * xs * s_ref[0, :] + b_ref[0, :]).astype(
        o_ref.dtype
    )
    o_ref[...] = o.reshape(o_ref.shape)


def _ln_matmul_w8a8_reference(x, ln_s, ln_b, w, s, b, eps):
    xn = _layernorm(x.astype(jnp.float32), ln_s, ln_b, eps)
    return _qdot_ref(xn, w, s, b).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_ln_matmul_w8a8(
    x: jnp.ndarray,  # [N, S, C]
    ln_s, ln_b, w, s, b,
    interpret: bool = False,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """LayerNorm → per-row quantize → s8×s8→s32 matmul → rescale+bias in
    one pass (the LN1→qkv front of an int8 global block)."""
    return _ln_matmul_w8a8_forward(x, ln_s, ln_b, w, s, b, interpret, eps)


def _ln_matmul_w8a8_forward(x, ln_s, ln_b, w, s, b, interpret, eps):
    n, sl, c = x.shape
    d = w.shape[1]
    if not interpret and jax.default_backend() != "tpu":
        return _ln_matmul_w8a8_reference(x, ln_s, ln_b, w, s, b, eps)
    bw = 1
    while bw * 2 * sl <= 1024 and n % (bw * 2) == 0:
        bw *= 2
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    f32 = jnp.float32
    vec = lambda a: a.reshape(1, -1).astype(f32)
    return pl.pallas_call(
        functools.partial(_ln_matmul_w8a8_kernel, eps=eps),
        grid=(n // bw,),
        in_specs=[
            pl.BlockSpec((bw, sl, c), lambda i: (i, 0, 0)),
            full((1, c)), full((1, c)),
            full(w.shape), full((1, d)), full((1, d)),
        ],
        out_specs=pl.BlockSpec((bw, sl, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, sl, d), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(x, vec(ln_s), vec(ln_b), w, vec(s), vec(b))


def _ln_matmul_w8a8_fwd(x, ln_s, ln_b, w, s, b, interpret, eps):
    return (
        fused_ln_matmul_w8a8(x, ln_s, ln_b, w, s, b, interpret, eps),
        (x, ln_s, ln_b, w, s, b),
    )


def _ln_matmul_w8a8_bwd(interpret, eps, res, g):
    x, ln_s, ln_b, w, s, b = res
    f32 = jnp.float32

    def deq_ref(xx, ls, lb, ww, ss, bb):
        wd = (ww.astype(f32) * ss.astype(f32)[None, :]).astype(xx.dtype)
        return _ln_matmul_reference(xx, ls, lb, wd, bb.astype(xx.dtype), eps)

    _, vjp = jax.vjp(deq_ref, x, ln_s, ln_b, w, s, b)
    return vjp(g)


fused_ln_matmul_w8a8.defvjp(_ln_matmul_w8a8_fwd, _ln_matmul_w8a8_bwd)


def _tail_w8a8_kernel(
    sc_ref,  # [bw, S, C] shortcut
    att_ref,  # [bw, S, A] attention output (pre-proj)
    wp_ref, sp_ref, bp_ref,  # int8 [A, C], [1, C] ×2
    ln2_s_ref, ln2_b_ref,  # [1, C]
    w1_ref, s1_ref, b1_ref,  # int8 [C, M], [1, M] ×2
    w2_ref, s2_ref, b2_ref,  # int8 [M, C], [1, C] ×2
    o_ref,  # [bw, S, C]
    *,
    act: str,
    eps: float,
):
    rows = sc_ref.shape[0] * sc_ref.shape[1]
    dtype = sc_ref.dtype
    sc = sc_ref[...].reshape(rows, sc_ref.shape[-1])
    att = att_ref[...].reshape(rows, att_ref.shape[-1])

    def qdot(q, xs, w_ref_, s_ref_, b_ref_):
        acc = jax.lax.dot_general(
            q, w_ref_[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * xs * s_ref_[0, :] + b_ref_[0, :]

    qa, sa = _quant_rows_f32(att.astype(jnp.float32))
    x1 = sc + qdot(qa, sa, wp_ref, sp_ref, bp_ref).astype(dtype)
    xm = _layernorm(
        x1.astype(jnp.float32), ln2_s_ref[0, :], ln2_b_ref[0, :], eps
    )
    qm, sm = _quant_rows_f32(xm)
    hmid = _ACTS[act](qdot(qm, sm, w1_ref, s1_ref, b1_ref))
    qh, sh = _quant_rows_f32(hmid)
    mlp = qdot(qh, sh, w2_ref, s2_ref, b2_ref).astype(dtype)
    o_ref[...] = (x1 + mlp).reshape(o_ref.shape)


def _tail_w8a8_reference(shortcut, att, params, act, eps):
    (wproj, sproj, bproj, ln2_s, ln2_b, w1, s1, b1, w2, s2, b2) = params
    dtype = shortcut.dtype
    x1 = shortcut + _qdot_ref(att, wproj, sproj, bproj).astype(dtype)
    xm = _layernorm(x1.astype(jnp.float32), ln2_s, ln2_b, eps)
    h = _ACTS[act](_qdot_ref(xm, w1, s1, b1))
    return x1 + _qdot_ref(h, w2, s2, b2).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_block_tail_w8a8(
    shortcut: jnp.ndarray,  # [N, S, C]
    att: jnp.ndarray,  # [N, S, A] pre-proj attention output
    params: tuple,  # (wproj_q, sproj, bproj, ln2_s, ln2_b,
    #                 w1_q, s1, b1, w2_q, s2, b2)
    interpret: bool = False,
    act: str = "gelu_exact",
    eps: float = 1e-6,
) -> jnp.ndarray:
    """W8A8 proj → +residual → LN2 → MLP → +residual in one pass."""
    return _tail_w8a8_forward(shortcut, att, params, interpret, act, eps)


def _tail_w8a8_forward(shortcut, att, params, interpret, act, eps):
    (wproj, sproj, bproj, ln2_s, ln2_b, w1, s1, b1, w2, s2, b2) = params
    n, sl, c = shortcut.shape
    a = att.shape[-1]
    m = w1.shape[1]
    if not interpret and jax.default_backend() != "tpu":
        return _tail_w8a8_reference(shortcut, att, params, act, eps)
    bw = 1
    while bw * 2 * sl <= 1024 and n % (bw * 2) == 0:
        bw *= 2
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    f32 = jnp.float32
    vec = lambda x_: x_.reshape(1, -1).astype(f32)
    return pl.pallas_call(
        functools.partial(_tail_w8a8_kernel, act=act, eps=eps),
        grid=(n // bw,),
        in_specs=[
            pl.BlockSpec((bw, sl, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((bw, sl, a), lambda i: (i, 0, 0)),
            full(wproj.shape), full((1, c)), full((1, c)),
            full((1, c)), full((1, c)),
            full(w1.shape), full((1, m)), full((1, m)),
            full(w2.shape), full((1, c)), full((1, c)),
        ],
        out_specs=pl.BlockSpec((bw, sl, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, sl, c), shortcut.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(
        shortcut, att,
        wproj, vec(sproj), vec(bproj),
        vec(ln2_s), vec(ln2_b),
        w1, vec(s1), vec(b1),
        w2, vec(s2), vec(b2),
    )


def _tail_w8a8_fwd(shortcut, att, params, interpret, act, eps):
    return (
        fused_block_tail_w8a8(shortcut, att, params, interpret, act, eps),
        (shortcut, att, params),
    )


def _tail_w8a8_bwd(interpret, act, eps, res, g):
    shortcut, att, params = res
    f32 = jnp.float32

    def deq_ref(s_, a_, p_):
        (wproj, sproj, bproj, ln2_s, ln2_b, w1, s1, b1, w2, s2, b2) = p_
        deq = lambda w, sc: (w.astype(f32) * sc.astype(f32)[None, :]).astype(
            s_.dtype
        )
        fp = (deq(wproj, sproj), bproj.astype(s_.dtype), ln2_s, ln2_b,
              deq(w1, s1), b1.astype(s_.dtype), deq(w2, s2),
              b2.astype(s_.dtype))
        return _tail_reference(s_, a_, fp, act, eps)

    _, vjp = jax.vjp(deq_ref, shortcut, att, params)
    return vjp(g)


fused_block_tail_w8a8.defvjp(_tail_w8a8_fwd, _tail_w8a8_bwd)
