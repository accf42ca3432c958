"""Pallas TPU flash attention (forward).

TPU-native replacement for the reference's flash-attn-2 CUDA kernels
(reference: ufvideo/train.py:973) and torch SDPA kernels used throughout SAM2
(sam2.py:1484-1490). Online-softmax tiling keeps the [Sq, Skv] score matrix
out of HBM; all matmuls hit the MXU in the input dtype with fp32 accumulation.

Supports causal masking (with q/kv length mismatch as used in prefill),
per-batch kv length masking (padding), and grouped-query attention by
indexing the shared kv head from the BlockSpec index map (no kv repetition
in HBM).

Causal alignment contract: query row r sits at position r + (Skv - Sq) —
BUFFER-end aligned, a static offset. ``kv_lens`` only masks tail padding;
it does NOT shift the causal diagonal. The two combine correctly for the
shipped uses (prefill: Sq == Skv, offset 0, rows past kv_len are padding;
pure kv-padding masking: causal=False). A chunked-decode caller whose q
chunk ends at kv_lens[b] (valid-END aligned, kv_lens[b] < Skv) must trim
the kv buffer to kv_lens — passing the padded buffer would place the
diagonal at the buffer end and let the chunk see its own future. The same
convention holds in ops/attention.py (xla/blockwise variants).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_KV = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(
    # scalar prefetch
    kv_lens_ref,  # [B] int32 in SMEM
    # inputs (BHSD layout: last two dims are seq x head_dim tiles)
    q_ref,  # [1, 1, block_q, d]
    k_ref,  # [1, 1, block_kv, d]
    v_ref,  # [1, 1, block_kv, d]
    kv_mask_ref,  # [1, 1, block_kv] int32 (all-ones when unused)
    # outputs
    o_ref,  # [1, 1, block_q, d]
    # scratch
    acc_ref,  # [block_q, d] f32
    m_ref,  # [block_q, 128] f32
    l_ref,  # [block_q, 128] f32
    *,
    scale: float,
    causal: bool,
    causal_offset: int,
    block_q: int,
    block_kv: int,
    num_kv_blocks: int,
    soft_dtype=jnp.float32,
    use_kv_mask: bool = False,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    kv_len = kv_lens_ref[b]
    kv_start = ik * block_kv

    block_live = kv_start < kv_len
    if causal:
        # earliest kv col of this block must be visible to the last q row
        block_live = jnp.logical_and(
            block_live, kv_start - causal_offset <= iq * block_q + block_q - 1
        )

    @pl.when(block_live)
    def _compute():
        q = q_ref[0, 0, :, :]
        k = k_ref[0, 0, :, :]
        v = v_ref[0, 0, :, :]

        # precision pinned to DEFAULT: Mosaic cannot honor a global
        # "highest" matmul precision on bf16 MXU matmuls
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) * scale  # [block_q, block_kv]

        col = kv_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_kv), 1
        )
        valid = col < kv_len
        if use_kv_mask:
            valid = jnp.logical_and(valid, kv_mask_ref[0, 0, :][None, :] > 0)
        if causal:
            row = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0
            )
            valid = jnp.logical_and(valid, col - causal_offset <= row)
        s = jnp.where(valid, s, _NEG_INF)

        m_prev = m_ref[:, :1]  # [block_q, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # clamp so exp(-inf - -inf) never produces NaN on all-masked rows
        m_safe = jnp.maximum(m_new, _NEG_INF / 2)

        # optionally run the exp in bf16 (2x VPU throughput; the row max has
        # already been subtracted so the argument is in [-inf, 0])
        p = jnp.exp((s - m_safe).astype(soft_dtype)).astype(jnp.float32)
        correction = jnp.exp(jnp.maximum(m_prev, _NEG_INF / 2) - m_safe)

        l_prev = l_ref[:, :1]
        l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)

        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        acc_ref[...] = acc_ref[...] * correction + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ik == num_kv_blocks - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0, 0, :, :] = (acc_ref[...] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_kv", "interpret", "soft_dtype"),
)
def flash_attention(
    q: jnp.ndarray,  # [B, Sq, Hq, D]
    k: jnp.ndarray,  # [B, Skv, Hkv, D]
    v: jnp.ndarray,
    *,
    causal: bool = False,
    kv_lens: Optional[jnp.ndarray] = None,  # [B] int32
    kv_mask: Optional[jnp.ndarray] = None,  # [B, Skv] bool per-token mask
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_kv: int = DEFAULT_BLOCK_KV,
    interpret: Optional[bool] = None,
    soft_dtype=jnp.float32,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    assert hq % hkv == 0, (hq, hkv)
    groups = hq // hkv
    scale_val = float(d ** -0.5) if scale is None else float(scale)
    causal_offset = skv - sq

    if kv_lens is None:
        kv_lens = jnp.full((b,), skv, dtype=jnp.int32)
    kv_lens = kv_lens.astype(jnp.int32)

    # adaptive blocks: for short sequences one whole-sequence block both
    # minimizes padding and amortizes pipeline fill (many tiny grid steps on
    # a (B, H, nq, nk) grid are latency-bound). For long NON-causal
    # sequences, big blocks (1024x2048, ~8.4 MB f32 scores under the raised
    # VMEM limit) keep the step count low: the default 256x512 blocking
    # turns Hiera's 4096-token global blocks into 8192 ~0.4us steps
    # (~20 TF/s measured); 1024x2048 runs the same math at MXU rate. Causal
    # long sequences keep fine blocks — coarse blocks can't skip the masked
    # upper triangle (a 2048-token prefill would compute ~2x the score
    # FLOPs), and the causal prefill path is already compute-optimal.
    if sq <= 1024:
        block_q = _round_up(sq, 128)
    elif not causal:
        block_q = max(block_q, min(1024, _round_up(sq, 128)))
    else:
        block_q = min(block_q, _round_up(sq, 128))
    if skv <= 1024:
        block_kv = _round_up(skv, 128)
    elif not causal:
        block_kv = max(block_kv, min(2048, _round_up(skv, 128)))
    else:
        block_kv = min(block_kv, _round_up(skv, 128))

    # pad seq and head dims to hardware-friendly multiples; move to BHSD so
    # the last two block dims are (seq, head_dim) tiles
    d_pad = _round_up(d, 128)
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_kv)
    qp = jnp.pad(
        q.transpose(0, 2, 1, 3),
        ((0, 0), (0, 0), (0, sq_pad - sq), (0, d_pad - d)),
    )
    kp = jnp.pad(
        k.transpose(0, 2, 1, 3),
        ((0, 0), (0, 0), (0, skv_pad - skv), (0, d_pad - d)),
    )
    vp = jnp.pad(
        v.transpose(0, 2, 1, 3),
        ((0, 0), (0, 0), (0, skv_pad - skv), (0, d_pad - d)),
    )

    num_q_blocks = sq_pad // block_q
    num_kv_blocks = skv_pad // block_kv
    grid = (b, hq, num_q_blocks, num_kv_blocks)

    use_kv_mask = kv_mask is not None
    if use_kv_mask:
        mp = jnp.pad(
            kv_mask.astype(jnp.int32), ((0, 0), (0, skv_pad - skv))
        )[:, None, :]
    else:
        mp = jnp.ones((b, 1, skv_pad), jnp.int32)

    kernel = functools.partial(
        _kernel,
        scale=scale_val,
        causal=causal,
        causal_offset=causal_offset,
        block_q=block_q,
        block_kv=block_kv,
        num_kv_blocks=num_kv_blocks,
        soft_dtype=soft_dtype,
        use_kv_mask=use_kv_mask,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d_pad),
                lambda b, h, iq, ik, *_: (b, h, iq, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_kv, d_pad),
                lambda b, h, iq, ik, *_, groups=groups: (b, h // groups, ik, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_kv, d_pad),
                lambda b, h, iq, ik, *_, groups=groups: (b, h // groups, ik, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_kv),
                lambda b, h, iq, ik, *_: (b, 0, ik),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d_pad),
            lambda b, h, iq, ik, *_: (b, h, iq, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, d_pad), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, sq_pad, d_pad), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * sq * skv * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * hq * sq * skv,
        ),
    )(kv_lens, qp, kp, vp, mp)

    return out[:, :, :sq, :d].transpose(0, 2, 1, 3)
