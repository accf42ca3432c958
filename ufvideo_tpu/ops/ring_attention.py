"""Ring attention: context parallelism over the device mesh.

The reference has no long-context mechanism at all (SURVEY §5: sequence
length capped at 2048; no ring/Ulysses). This is the TPU-native extension:
the sequence is sharded over a mesh axis, each device computes blockwise
attention against the KV shard it currently holds while `ppermute` rotates
KV shards around the ICI ring — compute and communication overlap, no device
ever materializes the full sequence.

Built on shard_map; the per-step math reuses the online-softmax formulation
of ops.attention.blockwise_attention, so it is differentiable (scan + psum
transpose handled by JAX).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _ring_attention_local(
    q: jnp.ndarray,  # [B, Sq_local, Hq, D]
    k: jnp.ndarray,  # [B, Skv_local, Hkv, D]
    v: jnp.ndarray,
    kv_lens: Optional[jnp.ndarray],  # [B] global valid kv length
    *,
    axis_name: str,
    causal: bool,
    scale: float,
) -> jnp.ndarray:
    b, sq, hq, d = q.shape
    skv = k.shape[1]
    hkv = k.shape[2]
    groups = hq // hkv
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)

    qf = (q.astype(jnp.float32) * scale).reshape(b, sq, hkv, groups, d)
    q_offset = my * sq
    row = q_offset + jnp.arange(sq)

    def block(i, kb, vb, m_prev, l_prev, acc):
        src = (my - i) % n  # device the current shard originated from
        col = src * skv + jnp.arange(skv)
        s = jnp.einsum("bqhgd,bkhd->bhgqk", qf, kb.astype(jnp.float32))
        if causal:
            cmask = col[None, :] <= row[:, None]
            s = jnp.where(cmask[None, None, None], s, _NEG_INF)
        if kv_lens is not None:
            valid = col[None, :] < kv_lens[:, None]  # [B, skv]
            s = jnp.where(valid[:, None, None, None], s, _NEG_INF)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        m_safe = jnp.maximum(m_new, _NEG_INF / 2)
        p = jnp.exp(s - m_safe[..., None])
        corr = jnp.exp(jnp.maximum(m_prev, _NEG_INF / 2) - m_safe)
        l_new = l_prev * corr + jnp.sum(p, axis=-1)
        pv = jnp.einsum("bhgqk,bkhd->bhgqd", p, vb.astype(jnp.float32))
        acc = acc * corr[..., None] + pv
        return m_new, l_new, acc

    def step(i, carry):
        kb, vb, m_prev, l_prev, acc = carry
        m_new, l_new, acc = block(i, kb, vb, m_prev, l_prev, acc)
        # rotate kv shards around the ring (overlaps with the next step's
        # compute under XLA's async collective scheduling)
        perm = [(j, (j + 1) % n) for j in range(n)]
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        return kb, vb, m_new, l_new, acc

    init = (
        k, v,
        jnp.full((b, hkv, groups, sq), _NEG_INF, jnp.float32),
        jnp.zeros((b, hkv, groups, sq), jnp.float32),
        jnp.zeros((b, hkv, groups, sq, d), jnp.float32),
    )
    # n-1 rotations suffice for n shards: the loop rotates after each of the
    # first n-1 blocks and the LAST block runs peeled, so no KV shard ships
    # a wasted final lap around the ring
    kb, vb, m, l, acc = jax.lax.fori_loop(0, n - 1, step, init)
    m, l, acc = block(n - 1, kb, vb, m, l, acc)
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    out = out.transpose(0, 3, 1, 2, 4).reshape(b, sq, hq, d)
    return out.astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,  # [B, S, Hq, D] — S sharded over ``axis``
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "fsdp",
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    kv_lens: Optional[jnp.ndarray] = None,  # [B] valid (unpadded) kv length
    batch_axis: Optional[str] = None,  # mesh axis sharding the batch dim
) -> jnp.ndarray:
    """Sequence-parallel attention over ``mesh[axis]``.

    Inputs/outputs are global arrays; shard_map slices the sequence dim
    (and optionally the batch dim over ``batch_axis``). S must divide the
    axis size. ``kv_lens`` masks padding keys like ops.attention's kv_lens.
    """
    d = q.shape[-1]
    scale_val = float(d ** -0.5) if scale is None else float(scale)
    spec = P(batch_axis, axis, None, None)
    lens_spec = P(batch_axis)
    fn = functools.partial(
        _ring_attention_local,
        axis_name=axis,
        causal=causal,
        scale=scale_val,
    )
    if kv_lens is None:
        return jax.shard_map(
            lambda qq, kk, vv: fn(qq, kk, vv, None),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        )(q, k, v)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(spec, spec, spec, lens_spec),
        out_specs=spec, check_vma=False,
    )(q, k, v, kv_lens)
