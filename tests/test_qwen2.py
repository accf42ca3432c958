"""Qwen2 LM: parity against HF Qwen2ForCausalLM and decode-path consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ufvideo_tpu.configs import Qwen2Config
from ufvideo_tpu.models.generate import forward_hidden, greedy_generate
from ufvideo_tpu.models.qwen2 import Qwen2LM, make_kv_cache
from ufvideo_tpu.weights import convert_qwen2

TINY = Qwen2Config(
    vocab_size=503,  # deliberately not a multiple of 256 → padding exercised
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    intermediate_size=128,
    rope_theta=10000.0,
    eos_token_id=2,
    pad_token_id=0,
)


@pytest.fixture(scope="module")
def hf_and_params():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config as HFCfg, Qwen2ForCausalLM

    hf_cfg = HFCfg(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        num_key_value_heads=TINY.num_kv_heads,
        head_dim=TINY.head_dim,
        intermediate_size=TINY.intermediate_size,
        rope_theta=TINY.rope_theta,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(hf_cfg).eval()
    params = convert_qwen2(hf.state_dict(), TINY)
    return torch, hf, params


def _model():
    return Qwen2LM(TINY, dtype=jnp.float32, param_dtype=jnp.float32)


def test_qwen2_logits_match_hf(hf_and_params):
    torch, hf, params = hf_and_params
    model = _model()
    rng = np.random.RandomState(1)
    ids = rng.randint(0, TINY.vocab_size, size=(2, 11)).astype(np.int32)

    with torch.no_grad():
        ref = hf(torch.from_numpy(ids).long()).logits.numpy()

    logits = model.apply({"params": params}, jnp.asarray(ids))
    logits = np.asarray(logits)[:, :, : TINY.vocab_size]
    np.testing.assert_allclose(logits, ref, atol=2e-4, rtol=2e-4)


def test_qwen2_greedy_matches_hf(hf_and_params):
    torch, hf, params = hf_and_params
    model = _model()
    rng = np.random.RandomState(2)
    ids = rng.randint(3, TINY.vocab_size, size=(1, 7)).astype(np.int32)
    max_new = 8

    with torch.no_grad():
        hf_out = hf.generate(
            torch.from_numpy(ids).long(),
            max_new_tokens=max_new,
            do_sample=False,
            eos_token_id=TINY.eos_token_id,
            pad_token_id=TINY.pad_token_id,
        )
    ref_tokens = hf_out[0, ids.shape[1]:].numpy()

    embeds = model.apply({"params": params}, jnp.asarray(ids), method=Qwen2LM.embed)
    res = greedy_generate(
        model,
        params,
        embeds,
        jnp.array([ids.shape[1]], jnp.int32),
        max_new_tokens=max_new,
        stop_ids=(TINY.eos_token_id,),
        cache_max_len=32,
    )
    got = np.asarray(res.tokens[0, : len(ref_tokens)])
    np.testing.assert_array_equal(got, ref_tokens)


def test_prefill_decode_consistency(hf_and_params):
    """Token-by-token decode must match the parallel (train-mode) forward."""
    _, _, params = hf_and_params
    model = _model()
    rng = np.random.RandomState(3)
    ids = rng.randint(3, TINY.vocab_size, size=(2, 9)).astype(np.int32)
    embeds = model.apply({"params": params}, jnp.asarray(ids), method=Qwen2LM.embed)
    seq_lens = jnp.array([9, 6], jnp.int32)

    full_hidden = forward_hidden(model, params, embeds, seq_lens)

    # prefill only the first 5 tokens, then decode the rest one by one
    split = 5
    cache = make_kv_cache(TINY, 2, 16, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(split, dtype=jnp.int32), (2, split))
    h, cache = model.apply(
        {"params": params}, embeds[:, :split], pos,
        jnp.array([split, split], jnp.int32), cache, None, "prefill",
        method=Qwen2LM.backbone,
    )
    np.testing.assert_allclose(
        np.asarray(h[0]), np.asarray(full_hidden[0, :split]), atol=1e-4, rtol=1e-4
    )

    cache_len = jnp.array([split, split], jnp.int32)
    for t in range(split, 9):
        h, cache = model.apply(
            {"params": params}, embeds[:, t : t + 1], cache_len[:, None],
            None, cache, cache_len, "decode",
            method=Qwen2LM.backbone,
        )
        np.testing.assert_allclose(
            np.asarray(h[0, 0]), np.asarray(full_hidden[0, t]), atol=1e-4,
            rtol=1e-4,
        )
        cache_len = cache_len + 1


def test_padded_batch_prefill_ignores_padding(hf_and_params):
    """Garbage tokens past seq_len must not affect valid positions."""
    _, _, params = hf_and_params
    model = _model()
    ids_a = np.array([[5, 6, 7, 0, 0]], np.int32)
    ids_b = np.array([[5, 6, 7, 99, 100]], np.int32)
    seq_lens = jnp.array([3], jnp.int32)
    for ids in (ids_a, ids_b):
        e = model.apply({"params": params}, jnp.asarray(ids), method=Qwen2LM.embed)
        h = forward_hidden(model, params, e, seq_lens)
        if ids is ids_a:
            ref = np.asarray(h[0, :3])
        else:
            np.testing.assert_allclose(np.asarray(h[0, :3]), ref, atol=1e-5)


def test_sampling_generate(hf_and_params):
    """Temperature/top-p sampling: valid tokens, deterministic per seed."""
    _, _, params = hf_and_params
    model = _model()
    ids = np.random.RandomState(5).randint(3, TINY.vocab_size, (1, 6)).astype(
        np.int32
    )
    embeds = model.apply({"params": params}, jnp.asarray(ids), method=Qwen2LM.embed)

    def run(seed):
        return greedy_generate(
            model, params, embeds, jnp.array([6], jnp.int32),
            max_new_tokens=6, stop_ids=(TINY.eos_token_id,),
            cache_max_len=16, do_sample=True, temperature=0.8, top_p=0.9,
            rng=jax.random.PRNGKey(seed),
        ).tokens

    a, b = run(0), run(0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    toks = np.asarray(run(1))
    assert ((toks >= 0) & (toks < TINY.vocab_size)).all()


def test_keyword_stop_sequences(hf_and_params):
    """Multi-token keyword stopping (the tokenized KeywordsStoppingCriteria,
    reference mm_utils.py:418-449): generation halts once the trailing
    generated ids equal a stop sequence."""
    _, _, params = hf_and_params
    model = _model()
    rng = np.random.RandomState(5)
    ids = rng.randint(3, TINY.vocab_size, size=(1, 6)).astype(np.int32)
    embeds = model.apply({"params": params}, jnp.asarray(ids), method=Qwen2LM.embed)
    lens = jnp.array([ids.shape[1]], jnp.int32)

    free = greedy_generate(
        model, params, embeds, lens, max_new_tokens=8,
        stop_ids=(), cache_max_len=32,
    )
    toks = np.asarray(free.tokens[0])
    # stop on the 2nd-3rd generated tokens as a keyword
    kw = (int(toks[1]), int(toks[2]))
    stopped = greedy_generate(
        model, params, embeds, lens, max_new_tokens=8,
        stop_ids=(), cache_max_len=32, stop_sequences=(kw,),
    )
    assert int(stopped.gen_lens[0]) == 3
    np.testing.assert_array_equal(
        np.asarray(stopped.tokens[0, :3]), toks[:3]
    )
    # single-token sequences behave like stop_ids
    single = greedy_generate(
        model, params, embeds, lens, max_new_tokens=8,
        stop_ids=(), cache_max_len=32, stop_sequences=((int(toks[1]),),),
    )
    assert int(single.gen_lens[0]) == 2


def test_remat_matches_dense_loss_and_grads():
    """remat=True (reference --gradient_checkpointing) must change nothing
    numerically — same loss, same grads, one extra forward in the bwd."""
    import dataclasses

    from ufvideo_tpu.configs import tiny_config

    base = tiny_config().llm
    outs = {}
    for remat in (False, True):
        cfg = dataclasses.replace(base, remat=remat)
        m = Qwen2LM(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))[
            "params"
        ]

        def loss(pp):
            h = m.apply({"params": pp}, jnp.arange(8)[None])
            return jnp.sum(h.astype(jnp.float32) ** 2)

        outs[remat] = (float(loss(p)), jax.grad(loss)(p))
    assert outs[False][0] == outs[True][0]
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
        outs[False][1], outs[True][1],
    )


def test_prefill_chunked_matches_single_pass():
    """greedy_generate(prefill_chunk=c) is bit-identical to the one-pass
    prefill (rows are independent; the chunks just bound transients)."""
    import numpy as np

    from ufvideo_tpu.models.generate import greedy_generate

    cfg = TINY
    model = Qwen2LM(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))[
        "params"
    ]
    b, s = 4, 12
    embeds = (
        0.1 * jax.random.normal(jax.random.PRNGKey(1), (b, s, cfg.hidden_size))
    ).astype(jnp.float32)
    lens = jnp.asarray([12, 7, 9, 12], jnp.int32)
    kw = dict(
        max_new_tokens=6, stop_ids=(-1,), cache_max_len=s + 6,
        vocab_size=cfg.vocab_size,
    )
    ref = greedy_generate(model, params, embeds, lens, **kw)
    # c=3 does not divide b=4: the last chunk's start clamps to b-c and
    # recomputes one row (must still be bit-identical)
    for c in (1, 2, 3):
        got = greedy_generate(
            model, params, embeds, lens, prefill_chunk=c, **kw
        )
        np.testing.assert_array_equal(
            np.asarray(got.tokens), np.asarray(ref.tokens)
        )
        np.testing.assert_allclose(
            np.asarray(got.hidden), np.asarray(ref.hidden), atol=1e-5
        )
