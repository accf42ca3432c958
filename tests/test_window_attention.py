"""Fused windowed attention kernel vs the per-head XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ufvideo_tpu.ops.attention import window_dense_attention
from ufvideo_tpu.ops.window_attention import (
    _reference,
    fused_window_attention,
)


def _fused_qkv(nw, s, heads, hd, hp, key):
    """qkv with REAL values in the first hd lanes of each head, zero pads —
    exactly what the head-padded converter produces."""
    ks = jax.random.split(key, 3)
    parts = []
    for i in range(3):
        t = jax.random.normal(ks[i], (nw, s, heads, hd))
        t = jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, hp - hd)))
        parts.append(t.reshape(nw, s, heads * hp))
    return jnp.concatenate(parts, axis=-1)


@pytest.mark.parametrize("nw,s,heads", [(8, 64, 2), (32, 16, 4), (4, 256, 8)])
def test_fused_matches_per_head_reference(nw, s, heads):
    hd, hp = 24, 128
    qkv = _fused_qkv(nw, s, heads, hd, hp, jax.random.PRNGKey(0))

    got = fused_window_attention(qkv, heads, hd, hp, True)  # interpret

    # independent oracle: split heads, run the plain dense-window attention
    x = qkv.reshape(nw, s, 3, heads, hp)
    want = window_dense_attention(
        x[:, :, 0], x[:, :, 1], x[:, :, 2], scale=hd ** -0.5
    ).reshape(nw, s, heads * hp)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )
    # zero pads stay zero through attention
    pads = np.asarray(got).reshape(nw, s, heads, hp)[..., hd:]
    assert np.abs(pads).max() == 0.0


def test_fused_block_diagonal_isolation():
    """Windows must not attend across each other even when batched into one
    grid step (the block-diagonal mask)."""
    hd = hp = 128
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    one = _fused_qkv(1, 16, 1, hd, hp, k1)
    other = _fused_qkv(1, 16, 1, hd, hp, k2)
    both = jnp.concatenate([one, other], axis=0)

    got = fused_window_attention(both, 1, hd, hp, True)
    solo = fused_window_attention(one, 1, hd, hp, True)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(solo[0]), atol=1e-5, rtol=1e-5
    )


def test_vjp_matches_reference_grads():
    hd, hp = 16, 128
    qkv = _fused_qkv(4, 16, 2, hd, hp, jax.random.PRNGKey(2))

    def loss_fused(x):
        return jnp.sum(fused_window_attention(x, 2, hd, hp, True) ** 2)

    def loss_ref(x):
        return jnp.sum(_reference(x, 2, hp, hd ** -0.5) ** 2)

    g1 = jax.grad(loss_fused)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4,
                               rtol=1e-4)
