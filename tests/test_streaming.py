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


class _ByteTok:
    def decode(self, ids, skip_special_tokens=True):
        return bytes(ids).decode("utf-8", errors="replace")


def _drain(streamer, chunks):
    out, stopped = [], False
    for c in chunks:
        d, stopped = streamer.push(c)
        out.append(d)
        if stopped:
            return out
    out.append(streamer.finish())
    return out


def test_text_streamer_holds_partial_utf8():
    """A multi-byte char split across chunks must never leak a U+FFFD."""
    from ufvideo_tpu.mm_utils import TextDeltaStreamer

    s = TextDeltaStreamer(_ByteTok())
    ids = list("ab".encode()) + list("日".encode()) + list("c".encode())
    # split mid-character: [a b e6] [97] [a5 c]
    deltas = _drain(s, [ids[:3], ids[3:4], ids[4:]])
    assert "�" not in "".join(deltas[:-1])
    assert "".join(deltas) == "ab日c"


def test_text_streamer_trailing_partial_flushed_at_finish():
    from ufvideo_tpu.mm_utils import TextDeltaStreamer

    s = TextDeltaStreamer(_ByteTok())
    ids = list("x".encode()) + list("日".encode())[:2]  # ends mid-char
    deltas = _drain(s, [ids])
    # finish() emits what the one-shot decode would: x + replacement char
    assert "".join(deltas) == bytes(ids).decode("utf-8", errors="replace")


def test_text_streamer_stop_never_leaks_across_chunks():
    """A stop string spanning a chunk boundary must not stream its prefix."""
    from ufvideo_tpu.mm_utils import TextDeltaStreamer

    s = TextDeltaStreamer(_ByteTok(), stop_strings=["###"])
    c1 = list("answer #".encode())
    c2 = list("##tail".encode())
    d1, st1 = s.push(c1)
    assert not st1 and d1 == "answer"  # ' #' held in the reserve window
    d2, st2 = s.push(c2)
    assert st2 and d2 == " "
    assert "".join([d1, d2]) == "answer "  # == trim_at_stop_strings result


def test_text_streamer_stop_inside_one_chunk():
    from ufvideo_tpu.mm_utils import TextDeltaStreamer

    s = TextDeltaStreamer(_ByteTok(), stop_strings=["STOP"])
    d, stopped = s.push(list("hello STOP world".encode()))
    assert stopped and d == "hello "


def test_text_streamer_join_equals_oneshot_random():
    """Fuzz: random byte chunks — joined deltas == one-shot decode."""
    from ufvideo_tpu.mm_utils import TextDeltaStreamer

    rng = np.random.RandomState(0)
    for trial in range(20):
        n = rng.randint(1, 60)
        ids = [int(b) for b in rng.bytes(n)]
        s = TextDeltaStreamer(_ByteTok())
        cuts = sorted(rng.choice(n + 1, size=min(4, n), replace=True))
        chunks, prev = [], 0
        for c in list(cuts) + [n]:
            if c > prev:
                chunks.append(ids[prev:c])
                prev = c
        deltas = _drain(s, chunks)
        assert "".join(deltas) == bytes(ids).decode("utf-8", errors="replace"), trial


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
    # (no delta-count assertion: the tiny byte tokenizer's random output is
    # mostly invalid UTF-8, which the U+FFFD holdback correctly defers to
    # the final flush; incrementality on VALID text is pinned by the
    # TextDeltaStreamer unit tests above)
    assert len(deltas) >= 1

    # spec_decode composes with streaming: same text again
    smodel, _, stok = model_init(None, cfg=tiny_config().replace(spec_decode=3))
    sdeltas = list(mm_infer_stream(
        video, "What happens?", smodel, stok, max_new_tokens=8, chunk=3
    ))
    assert "".join(sdeltas).strip() == text
