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


def _quantize(x):
    from ufvideo_tpu.models.qwen2 import quantize_kv

    return quantize_kv(x)


def test_ragged_decode_q8_interpret():
    """int8-KV kernel vs the fp reference on the dequantized cache: the
    only error left is the int8 rounding itself."""
    from ufvideo_tpu.ops.decode_attention import ragged_decode_attention_q8

    q, k, v, lens = _inputs()
    kq, ks = _quantize(k)
    vq, vs = _quantize(v)
    got = ragged_decode_attention_q8(q, kq, vq, ks, vs, lens, interpret=True)
    kd = (kq.astype(jnp.float32) * ks[..., None])
    vd = (vq.astype(jnp.float32) * vs[..., None])
    want = _ref(q, kd, vd, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # and against the unquantized truth within int8 rounding error
    truth = _ref(q, k, v, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(truth), atol=2e-2)


def test_decode_attention_q8_xla_path():
    from ufvideo_tpu.ops.attention import decode_attention

    q, k, v, lens = _inputs(b=2, hkv=2, g=4, d=32, s=256)
    kq, ks = _quantize(k)
    vq, vs = _quantize(v)
    got = decode_attention(
        q.reshape(2, 1, 8, 32), kq, vq, lens, k_scale=ks, v_scale=vs
    )
    want = _ref(q, k, v, lens).reshape(2, 1, 8, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2)


def test_generate_kv_quant_matches_bf16_cache():
    """End-to-end: greedy_generate with the int8 KV cache produces the same
    greedy tokens as the bf16 cache on a tiny model (and finite hidden)."""
    from ufvideo_tpu.configs import Qwen2Config
    from ufvideo_tpu.models.generate import greedy_generate
    from ufvideo_tpu.models.qwen2 import Qwen2LM

    cfg = Qwen2Config(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=8, intermediate_size=64,
        eos_token_id=2, pad_token_id=0,
    )
    model = Qwen2LM(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))[
        "params"
    ]
    embeds = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))
    lens = jnp.asarray([16, 9], jnp.int32)
    kw = dict(
        max_new_tokens=8, stop_ids=(2,), cache_max_len=32, vocab_size=128
    )
    ref = greedy_generate(model, params, embeds, lens, **kw)
    got = greedy_generate(model, params, embeds, lens, kv_quant=True, **kw)
    assert np.isfinite(np.asarray(got.hidden, np.float32)).all()
    np.testing.assert_array_equal(
        np.asarray(got.tokens), np.asarray(ref.tokens)
    )


@requires_tpu
def test_ragged_decode_q8_tpu_qwen_shape():
    from ufvideo_tpu.ops.decode_attention import ragged_decode_attention_q8

    q, k, v, lens = _inputs(b=1, hkv=4, g=7, d=128, s=4096, dtype=jnp.bfloat16)
    kq, ks = _quantize(k)
    vq, vs = _quantize(v)
    got = ragged_decode_attention_q8(q, kq, vq, ks, vs, lens)
    want = _ref(q, k, v, lens)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=4e-2, rtol=4e-2,
    )
