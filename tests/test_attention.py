"""Flash-attention kernel vs XLA reference parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ufvideo_tpu.ops.attention import attention, xla_attention
from conftest import requires_tpu


def _rand_qkv(key, b, sq, skv, hq, hkv, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, hq, d), dtype)
    k = jax.random.normal(kk, (b, skv, hkv, d), dtype)
    v = jax.random.normal(kv, (b, skv, hkv, d), dtype)
    return q, k, v


def test_xla_attention_matches_naive():
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), 2, 16, 16, 4, 4, 8)
    out = xla_attention(q, k, v)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(8)
    ref = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(logits, axis=-1), v)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_xla_attention_causal():
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 1, 8, 8, 2, 2, 8)
    out = xla_attention(q, k, v, causal=True)
    # row 0 attends only to kv 0
    ref0 = v[:, 0]
    np.testing.assert_allclose(out[:, 0], ref0, atol=1e-5)


def test_xla_attention_gqa_matches_repeated():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), 2, 12, 12, 8, 2, 16)
    out = xla_attention(q, k, v)
    k_rep = jnp.repeat(k, 4, axis=2)
    v_rep = jnp.repeat(v, 4, axis=2)
    ref = xla_attention(q, k_rep, v_rep)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_xla_attention_kv_lens():
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), 2, 4, 10, 2, 2, 8)
    kv_lens = jnp.array([10, 6], dtype=jnp.int32)
    out = xla_attention(q, k, v, kv_lens=kv_lens)
    ref1 = xla_attention(q[1:], k[1:, :6], v[1:, :6])
    np.testing.assert_allclose(out[1:], ref1, atol=1e-5)


def test_flash_attention_interpret_small():
    """Kernel-logic coverage on CPU via Pallas interpret mode."""
    from ufvideo_tpu.ops.flash_attention import flash_attention

    q, k, v = _rand_qkv(jax.random.PRNGKey(5), 1, 256, 256, 2, 1, 64)
    out = flash_attention(
        q, k, v, causal=True, block_q=128, block_kv=128, interpret=True
    )
    ref = xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


@requires_tpu
@pytest.mark.parametrize(
    "b,sq,skv,hq,hkv,d,causal",
    [
        (1, 256, 256, 4, 4, 128, False),
        (2, 384, 384, 4, 2, 64, True),  # unaligned d, GQA, causal
        (1, 729, 729, 16, 16, 72, False),  # SigLIP shape
        (1, 200, 1224, 2, 2, 72, False),  # cross-attention shape
    ],
)
def test_flash_attention_matches_xla(b, sq, skv, hq, hkv, d, causal):
    from ufvideo_tpu.ops.flash_attention import flash_attention

    q, k, v = _rand_qkv(
        jax.random.PRNGKey(42), b, sq, skv, hq, hkv, d, jnp.bfloat16
    )
    out = flash_attention(q, k, v, causal=causal)
    ref = xla_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(
        out.astype(np.float32), ref.astype(np.float32), atol=2e-2, rtol=2e-2
    )


@requires_tpu
def test_flash_attention_kv_lens():
    from ufvideo_tpu.ops.flash_attention import flash_attention

    q, k, v = _rand_qkv(
        jax.random.PRNGKey(7), 2, 256, 512, 4, 4, 128, jnp.bfloat16
    )
    kv_lens = jnp.array([512, 300], dtype=jnp.int32)
    out = flash_attention(q, k, v, kv_lens=kv_lens)
    ref = xla_attention(q, k, v, kv_lens=kv_lens)
    np.testing.assert_allclose(
        out.astype(np.float32), ref.astype(np.float32), atol=2e-2, rtol=2e-2
    )


@requires_tpu
def test_flash_attention_grad_on_tpu():
    """The Pallas forward must be differentiable (VJP recomputes through the
    blockwise XLA path) — training attention goes through this."""
    from ufvideo_tpu.ops.attention import attention

    q, k, v = _rand_qkv(jax.random.PRNGKey(9), 1, 256, 256, 4, 2, 64,
                        jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(
            attention(q, k, v, causal=True, impl="pallas").astype(jnp.float32)
            ** 2
        )

    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    for g in grads:
        assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))


def test_flash_kv_mask_interpret():
    """Per-token kv masking (memory-attention path) on the kernel."""
    from ufvideo_tpu.ops.flash_attention import flash_attention

    q, k, v = _rand_qkv(jax.random.PRNGKey(11), 2, 128, 256, 2, 2, 64)
    mask = jax.random.uniform(jax.random.PRNGKey(12), (2, 256)) > 0.3
    out = flash_attention(q, k, v, kv_mask=mask, interpret=True,
                          block_q=128, block_kv=128)
    ref = xla_attention(
        q, k, v,
        mask=jnp.broadcast_to(mask[:, None, :], (2, 128, 256)),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_kv_mask_folds_into_explicit_mask():
    """attention(kv_mask=..., mask=...) must honor BOTH constraints (the
    kv-validity mask used to be dropped whenever an explicit mask was also
    given)."""
    import numpy as np

    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (2, 4, 2, 8))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (2, 6, 2, 8))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (2, 6, 2, 8))
    kv_mask = jnp.array([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 0]], bool)
    all_true = jnp.ones((2, 4, 6), bool)

    only_kv = attention(q, k, v, kv_mask=kv_mask, impl="xla")
    both = attention(q, k, v, kv_mask=kv_mask, mask=all_true, impl="xla")
    np.testing.assert_allclose(
        np.asarray(both), np.asarray(only_kv), atol=1e-6
    )


def test_blockwise_with_mask_falls_back_to_xla():
    """impl='blockwise' has no arbitrary-mask support — the dispatcher must
    route to xla rather than silently ignoring the mask."""
    import numpy as np

    rng = jax.random.PRNGKey(1)
    q = jax.random.normal(rng, (1, 4, 2, 8))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (1, 4, 2, 8))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (1, 4, 2, 8))
    mask = jnp.tril(jnp.ones((4, 4), bool))
    ref = attention(q, k, v, mask=mask, impl="xla")
    got = attention(q, k, v, mask=mask, impl="blockwise")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
