"""Streaming decode: chunked dispatches must be token-identical to the
fused loop, across chunk sizes, stops, sampling, and batch raggedness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ufvideo_tpu.configs import Qwen2Config
from ufvideo_tpu.models.generate import greedy_generate, stream_generate
from ufvideo_tpu.models.qwen2 import Qwen2LM


def _setup(seed=0, b=2, s=20):
    cfg = Qwen2Config(
        hidden_size=32, intermediate_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=8, vocab_size=64, remat=False,
    )
    model = Qwen2LM(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    ids = jax.random.randint(jax.random.PRNGKey(seed + 1), (b, s), 1, 64)
    embeds = model.apply({"params": params}, ids, method=Qwen2LM.embed)
    return cfg, model, params, embeds


def _collect(model, params, embeds, seq_lens, **kw):
    """Drain stream_generate → per-row token lists."""
    b = embeds.shape[0]
    rows = [[] for _ in range(b)]
    for tokens, n, _hid, _done in stream_generate(
        model, params, embeds, seq_lens, **kw
    ):
        for i in range(b):
            rows[i].extend(np.asarray(tokens[i, : int(n[i])]).tolist())
    return rows


@pytest.mark.parametrize("chunk", [1, 3, 7, 64])
def test_stream_matches_fused_greedy(chunk):
    cfg, model, params, embeds = _setup()
    lens = jnp.asarray([20, 13], jnp.int32)
    kw = dict(max_new_tokens=17, stop_ids=(-1,), cache_max_len=20 + 17)
    g = greedy_generate(model, params, embeds, lens, **kw)
    rows = _collect(model, params, embeds, lens, chunk=chunk, **kw)
    for i in range(2):
        n = int(g.gen_lens[i])
        assert rows[i] == np.asarray(g.tokens[i, :n]).tolist(), (chunk, i)


def test_stream_stop_id_mid_chunk():
    cfg, model, params, embeds = _setup(seed=4)
    lens = jnp.asarray([20, 20], jnp.int32)
    base = greedy_generate(
        model, params, embeds, lens, max_new_tokens=16, stop_ids=(-1,),
        cache_max_len=36,
    )
    stop = int(base.tokens[0, 5])  # some token row 0 emits
    kw = dict(max_new_tokens=16, stop_ids=(stop,), cache_max_len=36)
    g = greedy_generate(model, params, embeds, lens, **kw)
    rows = _collect(model, params, embeds, lens, chunk=4, **kw)
    for i in range(2):
        n = int(g.gen_lens[i])
        assert rows[i] == np.asarray(g.tokens[i, :n]).tolist(), i


def test_stream_matches_fused_sampling():
    """Same seed → identical rng split order → identical sampled stream."""
    cfg, model, params, embeds = _setup(seed=8)
    lens = jnp.asarray([20, 20], jnp.int32)
    kw = dict(
        max_new_tokens=12, stop_ids=(-1,), cache_max_len=32,
        do_sample=True, temperature=0.9, top_p=0.8,
        rng=jax.random.PRNGKey(42),
    )
    g = greedy_generate(model, params, embeds, lens, **kw)
    rows = _collect(model, params, embeds, lens, chunk=5, **kw)
    for i in range(2):
        n = int(g.gen_lens[i])
        assert rows[i] == np.asarray(g.tokens[i, :n]).tolist(), i


def test_stream_hidden_states_match():
    cfg, model, params, embeds = _setup(seed=12)
    lens = jnp.asarray([20, 20], jnp.int32)
    kw = dict(max_new_tokens=9, stop_ids=(-1,), cache_max_len=32)
    g = greedy_generate(model, params, embeds, lens, **kw)
    got = [[] for _ in range(2)]
    for tokens, n, hid, _done in stream_generate(
        model, params, embeds, lens, chunk=4, **kw
    ):
        for i in range(2):
            got[i].append(np.asarray(hid[i, : int(n[i])], np.float32))
    for i in range(2):
        n = int(g.gen_lens[i])
        np.testing.assert_allclose(
            np.concatenate(got[i]), np.asarray(g.hidden[i, :n], np.float32),
            rtol=2e-4, atol=2e-4,
        )


@pytest.mark.slow
def test_mm_infer_stream_matches_mm_infer():
    from ufvideo_tpu.api import mm_infer, mm_infer_stream, model_init
    from ufvideo_tpu.configs import tiny_config

    model, _, tok = model_init(None, cfg=tiny_config())
    cfg = model.cfg
    video = np.random.RandomState(0).randn(
        cfg.budget.num_frames, cfg.vision.image_size, cfg.vision.image_size, 3
    ).astype(np.float32)
    text, _ = mm_infer(video, "What happens?", model, tok, max_new_tokens=8)
    deltas = list(mm_infer_stream(
        video, "What happens?", model, tok, max_new_tokens=8, chunk=3
    ))
    assert "".join(deltas).strip() == text
    assert len(deltas) >= 2  # actually incremental

    # spec_decode composes with streaming: same text again
    smodel, _, stok = model_init(None, cfg=tiny_config().replace(spec_decode=3))
    sdeltas = list(mm_infer_stream(
        video, "What happens?", smodel, stok, max_new_tokens=8, chunk=3
    ))
    assert "".join(sdeltas).strip() == text
