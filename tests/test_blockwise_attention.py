"""Blockwise (scan) attention: forward parity + gradient correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from ufvideo_tpu.ops.attention import blockwise_attention, xla_attention


def _qkv(seed, b=2, sq=24, skv=40, hq=4, hkv=2, d=16):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (
        jax.random.normal(ks[0], (b, sq, hq, d)),
        jax.random.normal(ks[1], (b, skv, hkv, d)),
        jax.random.normal(ks[2], (b, skv, hkv, d)),
    )


def test_blockwise_forward_matches_xla():
    q, k, v = _qkv(0)
    lens = jnp.array([40, 17], jnp.int32)
    for causal in (False, True):
        got = blockwise_attention(q, k, v, causal=causal, kv_lens=lens, chunk=16)
        want = xla_attention(q, k, v, causal=causal, kv_lens=lens)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )


def test_blockwise_gradients_match_xla():
    q, k, v = _qkv(1, b=1, sq=8, skv=12, hq=2, hkv=1, d=8)
    lens = jnp.array([10], jnp.int32)

    def loss_block(q, k, v):
        return jnp.sum(
            blockwise_attention(q, k, v, causal=True, kv_lens=lens, chunk=4) ** 2
        )

    def loss_xla(q, k, v):
        return jnp.sum(
            xla_attention(q, k, v, causal=True, kv_lens=lens) ** 2
        )

    g1 = jax.grad(loss_block, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-5
        )
