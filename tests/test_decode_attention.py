"""Ragged decode attention kernel vs XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import requires_tpu
from ufvideo_tpu.ops.attention import xla_attention
from ufvideo_tpu.ops.decode_attention import ragged_decode_attention


def _inputs(b=2, hkv=2, g=4, d=32, s=256, dtype=jnp.float32):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hkv, g, d), dtype)
    k = jax.random.normal(kk, (b, hkv, s, d), dtype)
    v = jax.random.normal(kv, (b, hkv, s, d), dtype)
    lens = jnp.asarray([s, s // 3][:b] if b <= 2 else [s] * b, jnp.int32)
    return q, k, v, lens


def _ref(q, k, v, lens):
    b, hkv, g, d = q.shape
    qf = q.reshape(b, 1, hkv * g, d)  # [B, 1, Hq, D]
    out = xla_attention(
        qf, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), kv_lens=lens
    )
    return out[:, 0].reshape(b, hkv, g, d)


def test_ragged_decode_interpret():
    q, k, v, lens = _inputs()
    got = ragged_decode_attention(q, k, v, lens, interpret=True)
    want = _ref(q, k, v, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@requires_tpu
def test_ragged_decode_tpu_qwen_shape():
    # Qwen2-7B decode shape: 4 kv heads x 7 groups x 128, 4k cache
    q, k, v, lens = _inputs(b=1, hkv=4, g=7, d=128, s=4096, dtype=jnp.bfloat16)
    got = ragged_decode_attention(q, k, v, lens)
    want = _ref(q, k, v, lens)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )
