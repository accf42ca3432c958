"""Pipeline parallelism: pipelined Qwen2 backbone vs the dense scan.

The pipeline must be a pure re-schedule: same per-microbatch math, same
results, gradients included. All tests run on the virtual 8-device CPU
mesh (conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from ufvideo_tpu.configs import Qwen2Config
from ufvideo_tpu.models.qwen2 import Qwen2LM
from ufvideo_tpu.parallel.pipeline import pipeline_apply, pipeline_backbone

TINY = Qwen2Config(
    vocab_size=256, hidden_size=32, num_layers=4, num_heads=4,
    num_kv_heads=2, head_dim=8, intermediate_size=64,
    eos_token_id=2, pad_token_id=0,
)


def _mesh(pipe, data=1):
    devs = np.asarray(jax.devices()[: pipe * data]).reshape(pipe, data)
    return Mesh(devs, ("pipe", "data"))


def _model_and_params(seed=0):
    model = Qwen2LM(TINY, dtype=jnp.float32, param_dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 8), jnp.int32)
    )["params"]
    return model, params


def _dense_hidden(model, params, embeds, positions, seq_lens):
    hidden, _ = model.apply(
        {"params": params}, embeds, positions, seq_lens,
        mode="train", method=Qwen2LM.backbone,
    )
    return hidden


@pytest.mark.smoke
@pytest.mark.parametrize("pipe,m", [(2, 4), (4, 8), (1, 2)])
def test_pipeline_backbone_matches_dense(pipe, m):
    model, params = _model_and_params()
    b, s = m, 12
    rng = jax.random.PRNGKey(1)
    embeds = jax.random.normal(rng, (b, s, TINY.hidden_size), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    seq_lens = jnp.full((b,), s, jnp.int32)

    dense = np.asarray(_dense_hidden(model, params, embeds, positions, seq_lens))
    pp = np.asarray(
        pipeline_backbone(
            TINY, params, embeds, positions, seq_lens, _mesh(pipe),
            num_microbatches=m, dtype=jnp.float32, param_dtype=jnp.float32,
        )
    )
    # tolerance: the pipelined program compiles to different fusions than
    # the dense scan, so FMA contraction orders differ at float epsilon
    np.testing.assert_allclose(pp, dense, rtol=2e-5, atol=1e-5)


def test_pipeline_composes_with_data_axis():
    """pipe=2 × data=2: microbatch rows sharded over the data axis."""
    model, params = _model_and_params()
    b, s = 8, 8  # M=4 microbatches of 2 rows, each row pair split over data
    embeds = jax.random.normal(
        jax.random.PRNGKey(2), (b, s, TINY.hidden_size), jnp.float32
    )
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    dense = np.asarray(_dense_hidden(
        model, params, embeds, positions, jnp.full((b,), s, jnp.int32)
    ))
    pp = np.asarray(
        pipeline_backbone(
            TINY, params, embeds, positions, None, _mesh(2, 2),
            num_microbatches=4, data_axis="data",
            dtype=jnp.float32, param_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(pp, dense, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("remat", [False, True])
def test_pipeline_gradients_match_dense(remat):
    """CE-style loss gradients through the pipeline == dense-scan gradients
    (microbatch accumulation is a pure re-association)."""
    model, params = _model_and_params()
    b, s = 4, 8
    embeds = jax.random.normal(
        jax.random.PRNGKey(3), (b, s, TINY.hidden_size), jnp.float32
    )
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    seq_lens = jnp.full((b,), s, jnp.int32)
    mesh = _mesh(2)

    def loss_dense(p):
        h = _dense_hidden(model, p, embeds, positions, seq_lens)
        return jnp.mean(h * h)

    def loss_pp(p):
        h = pipeline_backbone(
            TINY, p, embeds, positions, seq_lens, mesh,
            num_microbatches=2, dtype=jnp.float32, param_dtype=jnp.float32,
            remat=remat,
        )
        return jnp.mean(h * h)

    # jit is required around the remat'd pipeline (eager closed_call inside
    # shard_map is unsupported) and is how the train step runs it anyway
    ld, gd = jax.jit(jax.value_and_grad(loss_dense))(params)
    lp, gp = jax.jit(jax.value_and_grad(loss_pp))(params)
    np.testing.assert_allclose(float(lp), float(ld), rtol=1e-6)
    flat_d = jax.tree.leaves(gd)
    flat_p = jax.tree.leaves(gp)
    for a, b_ in zip(flat_d, flat_p):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=1e-5, atol=1e-6
        )


@pytest.mark.smoke
def test_qwen2lm_pp_option_matches_dense():
    """Qwen2LM(pp=...) — the in-model wiring — must reproduce the dense
    model's logits and gradients on the same params."""
    model, params = _model_and_params()
    mesh = _mesh(2, 2)
    pp_model = Qwen2LM(
        TINY, dtype=jnp.float32, param_dtype=jnp.float32,
        pp=(mesh, "pipe", 2, "data"),
    )
    ids = jax.random.randint(jax.random.PRNGKey(5), (4, 10), 3, TINY.vocab_size)

    dense = np.asarray(model.apply({"params": params}, ids))
    pp = np.asarray(pp_model.apply({"params": params}, ids))
    np.testing.assert_allclose(pp, dense, rtol=2e-5, atol=1e-5)

    tgt = jax.random.randint(jax.random.PRNGKey(6), (4, 10), 0, TINY.vocab_size)

    def loss(m):
        def f(p):
            lg = m.apply({"params": p}, ids)
            lp = jax.nn.log_softmax(lg.astype(jnp.float32), -1)
            return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

        return f

    ld, gd = jax.jit(jax.value_and_grad(loss(model)))(params)
    lp_, gp = jax.jit(jax.value_and_grad(loss(pp_model)))(params)
    np.testing.assert_allclose(float(lp_), float(ld), rtol=1e-6)
    for a, b_ in zip(jax.tree.leaves(gd), jax.tree.leaves(gp)):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=1e-4, atol=1e-6
        )


@pytest.mark.smoke
def test_pp_and_ring_are_mutually_exclusive():
    """pp's standalone layer template carries no ring attention, so asking
    for both must be an error, not a silent drop of sequence parallelism."""
    mesh = _mesh(2, 2)
    model = Qwen2LM(
        TINY, dtype=jnp.float32, param_dtype=jnp.float32,
        pp=(mesh, "pipe", 2, "data"), ring=(mesh, "data", None),
    )
    with pytest.raises(ValueError, match="mutually exclusive"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))


@pytest.mark.smoke
def test_pipeline_apply_layer_count_validation():
    mesh = _mesh(4)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(
            lambda pl, c: c, {"w": jnp.zeros((6, 2))},
            (jnp.zeros((2, 3)),), mesh,
        )
