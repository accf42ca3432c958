"""ViT full-attention kernel vs reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ufvideo_tpu.ops.attention import xla_attention
from ufvideo_tpu.ops.vit_attention import mha_full_attention


@pytest.mark.parametrize("b,s,h,d", [(2, 37, 4, 24), (4, 64, 2, 72)])
def test_kernel_matches_xla(b, s, h, d):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, s, h * d))
    k = jax.random.normal(ks[1], (b, s, h * d))
    v = jax.random.normal(ks[2], (b, s, h * d))

    got = mha_full_attention(q, k, v, h, d, True)  # interpret kernel
    want = xla_attention(
        q.reshape(b, s, h, d), k.reshape(b, s, h, d), v.reshape(b, s, h, d)
    ).reshape(b, s, h * d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_batched_images_isolated():
    """bb>1 packs several images per grid step; the block-diagonal mask must
    isolate them."""
    h, d, s = 2, 64, 8  # tiny: bb grows past 1
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    a = jax.random.normal(k1, (2, s, h * d))
    bq = jax.random.normal(k2, (2, s, h * d))

    got = mha_full_attention(a, bq, bq, h, d, True)
    solo = mha_full_attention(a[:1], bq[:1], bq[:1], h, d, True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(solo[0]),
                               atol=1e-5, rtol=1e-5)


def test_vjp_runs():
    q = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 48))

    def loss(x):
        return jnp.sum(mha_full_attention(x, x, x, 2, 24, True) ** 2)

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
