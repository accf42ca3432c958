"""Ring attention over the virtual CPU mesh vs single-device reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ufvideo_tpu.ops.attention import xla_attention
from ufvideo_tpu.ops.ring_attention import ring_attention
from ufvideo_tpu.parallel import create_mesh


@pytest.fixture(scope="module")
def sp_mesh():
    return create_mesh(dp=1, fsdp=4, tp=1, devices=jax.devices("cpu")[:4])


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_reference(sp_mesh, causal):
    b, s, hq, hkv, d = 2, 32, 4, 2, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, s, hq, d))
    k = jax.random.normal(ks[1], (b, s, hkv, d))
    v = jax.random.normal(ks[2], (b, s, hkv, d))

    want = xla_attention(q, k, v, causal=causal)
    got = ring_attention(q, k, v, sp_mesh, axis="fsdp", causal=causal)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_ring_attention_grad(sp_mesh):
    b, s, hq, hkv, d = 1, 16, 2, 1, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, s, hq, d))
    k = jax.random.normal(ks[1], (b, s, hkv, d))
    v = jax.random.normal(ks[2], (b, s, hkv, d))

    def loss_ring(q, k, v):
        return jnp.sum(
            ring_attention(q, k, v, sp_mesh, axis="fsdp", causal=True) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, causal=True) ** 2)

    g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-5
        )


def test_ring_attention_kv_lens(sp_mesh):
    b, s, hq, hkv, d = 2, 32, 4, 2, 16
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (b, s, hq, d))
    k = jax.random.normal(ks[1], (b, s, hkv, d))
    v = jax.random.normal(ks[2], (b, s, hkv, d))
    lens = jnp.array([23, 32], jnp.int32)

    want = xla_attention(q, k, v, causal=True, kv_lens=lens)
    got = ring_attention(
        q, k, v, sp_mesh, axis="fsdp", causal=True, kv_lens=lens
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_qwen2_ring_train_matches_dense(sp_mesh):
    """Sequence-parallel Qwen2 train forward == single-device logits —
    context parallelism through the model, not just the standalone op."""
    from ufvideo_tpu.configs import Qwen2Config
    from ufvideo_tpu.models.qwen2 import Qwen2LM

    cfg = Qwen2Config(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=8, intermediate_size=64,
        eos_token_id=2, pad_token_id=0,
    )
    dense = Qwen2LM(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    ringed = Qwen2LM(
        cfg, dtype=jnp.float32, param_dtype=jnp.float32,
        ring=(sp_mesh, "fsdp", None),
    )
    params = dense.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))[
        "params"
    ]
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 3, 128)
    lens = jnp.array([13, 16], jnp.int32)

    want = dense.apply({"params": params}, ids, lens)
    with sp_mesh:
        got = jax.jit(
            lambda p, i, l: ringed.apply({"params": p}, i, l)
        )(params, ids, lens)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
    )
