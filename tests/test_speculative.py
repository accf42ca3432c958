"""Prompt-lookup speculative decoding: greedy exactness + acceptance
mechanics on tiny random models (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ufvideo_tpu.configs import Qwen2Config
from ufvideo_tpu.models.generate import greedy_generate
from ufvideo_tpu.models.qwen2 import Qwen2LM
from ufvideo_tpu.models.speculative import spec_generate

import dataclasses


def _tiny_cfg(**kw):
    base = dict(
        hidden_size=32, intermediate_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=8, vocab_size=64, remat=False,
    )
    base.update(kw)
    return Qwen2Config(**base)


def _model_and_params(cfg, seed=0, quant=False):
    model = Qwen2LM(cfg, dtype=jnp.float32, param_dtype=jnp.float32,
                    quant=quant)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    return model, params


def _prompt(cfg, b, s, seed=1, repeat=True):
    """Prompt ids with internal bigram repetition (so lookup can fire)."""
    rng = np.random.RandomState(seed)
    phrase = rng.randint(1, cfg.vocab_size, size=s // 3)
    ids = np.concatenate([phrase, rng.randint(1, cfg.vocab_size, size=s // 3),
                          phrase])[:s]
    if not repeat:
        ids = rng.randint(1, cfg.vocab_size, size=s)
    out = np.stack([np.roll(ids, i) for i in range(b)])
    return jnp.asarray(out, jnp.int32)


def _run_pair(cfg, model, params, ids, seq_lens, max_new=24, k=3,
              stop_ids=(-1,), kv_quant=False):
    embeds = model.apply({"params": params}, ids, method=Qwen2LM.embed)
    s = ids.shape[1]
    g = greedy_generate(
        model, params, embeds, seq_lens, max_new_tokens=max_new,
        stop_ids=stop_ids, cache_max_len=s + max_new + k + 1,
        kv_quant=kv_quant,
    )
    sp = spec_generate(
        model, params, embeds, seq_lens, ids, max_new_tokens=max_new,
        stop_ids=stop_ids, cache_max_len=s + max_new + k + 1, draft_k=k,
        kv_quant=kv_quant,
    )
    return g, sp


def _assert_equal(g, sp):
    gl = np.asarray(g.gen_lens)
    sl = np.asarray(sp.gen_lens)
    np.testing.assert_array_equal(gl, sl)
    for i, n in enumerate(gl):
        np.testing.assert_array_equal(
            np.asarray(g.tokens[i, :n]), np.asarray(sp.tokens[i, :n]),
            err_msg=f"row {i}",
        )
        np.testing.assert_allclose(
            np.asarray(g.hidden[i, :n], np.float32),
            np.asarray(sp.hidden[i, :n], np.float32),
            rtol=2e-4, atol=2e-4,
        )


def test_spec_matches_greedy():
    cfg = _tiny_cfg()
    model, params = _model_and_params(cfg)
    ids = _prompt(cfg, b=2, s=30)
    g, sp = _run_pair(cfg, model, params, ids,
                      jnp.asarray([30, 30], jnp.int32))
    _assert_equal(g, sp)


def test_spec_matches_greedy_ragged_prompts():
    cfg = _tiny_cfg()
    model, params = _model_and_params(cfg, seed=3)
    ids = _prompt(cfg, b=3, s=24, seed=5)
    seq_lens = jnp.asarray([24, 17, 9], jnp.int32)
    # -1 at pad positions, the way the splice plan marks non-text slots
    # (embed() clamps them to 0; spec's history masks them out)
    ids = jnp.where(jnp.arange(24)[None, :] < seq_lens[:, None], ids, -1)
    g, sp = _run_pair(cfg, model, params, ids, seq_lens)
    _assert_equal(g, sp)


def test_spec_matches_greedy_kv_quant():
    cfg = _tiny_cfg()
    model, params = _model_and_params(cfg, seed=7)
    ids = _prompt(cfg, b=2, s=20, seed=9)
    g, sp = _run_pair(cfg, model, params, ids,
                      jnp.asarray([20, 20], jnp.int32), kv_quant=True)
    _assert_equal(g, sp)


def test_spec_respects_stop_ids():
    cfg = _tiny_cfg()
    model, params = _model_and_params(cfg, seed=11)
    ids = _prompt(cfg, b=1, s=18, seed=13)
    lens = jnp.asarray([18], jnp.int32)
    g0, _ = _run_pair(cfg, model, params, ids, lens, max_new=16)
    assert int(g0.gen_lens[0]) == 16
    # stop at whatever greedy emits 4th — both loops must cut at its FIRST
    # occurrence (which may be earlier than position 3)
    stop = int(g0.tokens[0, 3])
    expect = int(np.argmax(np.asarray(g0.tokens[0]) == stop)) + 1
    g, sp = _run_pair(cfg, model, params, ids, lens, max_new=16,
                      stop_ids=(stop,))
    _assert_equal(g, sp)
    assert int(sp.gen_lens[0]) == expect <= 4


def test_spec_accepts_drafts_on_degenerate_model():
    """Zero weights → constant logits → greedy emits token 0 forever; the
    (0,0) bigram then matches everywhere, drafts are all accepted, and the
    loop takes ~max_new/(K+1) forwards instead of max_new."""
    cfg = _tiny_cfg()
    model, params = _model_and_params(cfg)
    params = jax.tree.map(jnp.zeros_like, params)
    ids = _prompt(cfg, b=1, s=12)
    embeds = model.apply({"params": params}, ids, method=Qwen2LM.embed)
    max_new, k = 25, 4
    sp = spec_generate(
        model, params, embeds, jnp.asarray([12], jnp.int32), ids,
        max_new_tokens=max_new, stop_ids=(-1,),
        cache_max_len=12 + max_new + k + 1, draft_k=k,
    )
    assert int(sp.gen_lens[0]) == max_new
    np.testing.assert_array_equal(np.asarray(sp.tokens[0]), 0)
    assert int(sp.n_iters) <= 2 + (max_new - 1 + k) // (k + 1)
    assert int(sp.n_accepted[0]) >= max_new - int(sp.n_iters)


def test_spec_stream_matches_spec_and_greedy():
    """The per-iteration streaming path emits the same token stream as the
    fused spec loop (and therefore plain greedy)."""
    from ufvideo_tpu.models.speculative import spec_stream_generate

    cfg = _tiny_cfg()
    model, params = _model_and_params(cfg, seed=21)
    ids = _prompt(cfg, b=2, s=24, seed=23)
    lens = jnp.asarray([24, 24], jnp.int32)
    embeds = model.apply({"params": params}, ids, method=Qwen2LM.embed)
    kw = dict(max_new_tokens=18, stop_ids=(-1,),
              cache_max_len=24 + 18 + 4, draft_k=4)
    sp = spec_generate(model, params, embeds, lens, ids, **kw)
    rows = [[] for _ in range(2)]
    dispatches = 0
    for tokens, gen_lens, _hid, _done in spec_stream_generate(
        model, params, embeds, lens, ids, **kw
    ):
        dispatches += 1
        for i in range(2):
            n = int(gen_lens[i])
            rows[i] = np.asarray(tokens[i, :n]).tolist()
    for i in range(2):
        n = int(sp.gen_lens[i])
        assert rows[i] == np.asarray(sp.tokens[i, :n]).tolist(), i
    # one yield after prefill + one per verify iteration == n_iters (which
    # counts the prefill as forward #1)
    assert dispatches == int(sp.n_iters)


@pytest.mark.slow
def test_api_spec_decode_matches_plain():
    """cfg.spec_decode wires through mm_infer (multimodal splice included)
    and emits the same text/tokens as the plain greedy path."""
    from ufvideo_tpu.api import mm_infer, model_init
    from ufvideo_tpu.configs import tiny_config

    model, _, tok = model_init(None, cfg=tiny_config())
    cfg = model.cfg
    video = np.random.RandomState(0).randn(
        cfg.budget.num_frames, cfg.vision.image_size, cfg.vision.image_size, 3
    ).astype(np.float32)
    text, out = mm_infer(
        video, "Describe the video in detail.", model, tok, max_new_tokens=8
    )

    smodel, _, stok = model_init(None, cfg=tiny_config().replace(spec_decode=3))
    smodel.params = model.params  # same weights
    stext, sout = mm_infer(
        video, "Describe the video in detail.", smodel, stok, max_new_tokens=8
    )
    assert stext == text
    assert list(sout["output"]) == list(out["output"])


def test_spec_matches_greedy_int8_weights():
    cfg = _tiny_cfg()
    model, params = _model_and_params(cfg, seed=15)
    from ufvideo_tpu.quant import quantize_qwen2_params

    qparams = quantize_qwen2_params(
        jax.tree.map(lambda x: np.asarray(x, np.float32), params), bits=8
    )
    qmodel = Qwen2LM(cfg, dtype=jnp.float32, param_dtype=jnp.float32,
                     quant=True)
    ids = _prompt(cfg, b=2, s=16, seed=17)
    g, sp = _run_pair(cfg, qmodel, qparams, ids,
                      jnp.asarray([16, 16], jnp.int32))
    _assert_equal(g, sp)
