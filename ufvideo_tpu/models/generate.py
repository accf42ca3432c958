"""Greedy autoregressive generation with per-step hidden-state capture.

The TPU-native counterpart of the reference's HF ``generate`` usage
(reference: videorefer_qwen2.py:414-426): greedy decoding (do_sample=False,
ufvideo/__init__.py:114-117), stop-token early exit (the tokenized equivalent
of KeywordsStoppingCriteria, mm_utils.py:418-449), and capture of the
final-layer hidden state that produced each generated token — needed for
post-hoc ``[SEG]`` embedding extraction (videorefer_qwen2.py:428-439).

The whole loop is one jitted ``lax.while_loop`` over single-token decode
steps against a static-size KV cache; early exit when every sequence has
stopped.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..configs import Qwen2Config
from .qwen2 import Qwen2LM, make_kv_cache


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray  # [B, max_new] generated ids (pad after stop)
    gen_lens: jnp.ndarray  # [B] number of generated tokens incl. stop token
    hidden: jnp.ndarray  # [B, max_new, hidden] hidden state that produced each token


def _mask_vocab_logits(logits: jnp.ndarray, vocab_size: int) -> jnp.ndarray:
    """Mask out physical padding ids beyond the logical vocab."""
    pad = logits.shape[-1] - vocab_size
    if pad == 0:
        return logits
    neg = jnp.finfo(logits.dtype).min
    mask = jnp.arange(logits.shape[-1]) < vocab_size
    return jnp.where(mask, logits, neg)


def _sample_token(logits: jnp.ndarray, key, do_sample: bool,
                  temperature: float, top_p: float) -> jnp.ndarray:
    """Greedy or temperature/top-p sampling from [B, V] fp32 logits
    (reference generate kwargs: do_sample/temperature/top_p,
    ufvideo/__init__.py:114-117)."""
    if not do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / jnp.maximum(temperature, 1e-6)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set whose cumulative prob exceeds top_p
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, jnp.finfo(jnp.float32).min, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def prefill_cache(
    model: Qwen2LM,
    params,
    input_embeds: jnp.ndarray,  # [B, S, hidden]
    seq_lens: jnp.ndarray,  # [B] valid prompt lengths
    cache,
    *,
    kv_quant: bool = False,
    prefill_chunk: int = 0,
):
    """Prefill the KV cache; returns (cache, last-valid-position hidden
    [B, hidden]). Shared by the greedy and speculative decode loops.

    ``prefill_chunk`` > 0 runs ``chunk`` sequences at a time: big batches'
    prefill transients (one MLP activation is [B*S, intermediate] — 1.6 GB
    bf16 at batch 16 of a 2.8k prompt) dominate peak HBM, so each chunk runs
    through a prompt-length (not cache_max_len) scratch cache and copies its
    KV into its slice of the full cache. Math is row-independent, so this is
    bit-identical to one pass. ``chunk`` need not divide ``b``: the last
    chunk's start clamps to b-chunk (dynamic_slice semantics), recomputing a
    few rows that then rewrite equal values."""
    cfg: Qwen2Config = model.cfg
    b, s, hid = input_embeds.shape
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    c = prefill_chunk if 0 < prefill_chunk < b else 0
    if not c:
        hidden, cache = model.apply(
            {"params": params},
            input_embeds,
            positions,
            seq_lens,
            cache,
            None,
            "prefill",
            method=Qwen2LM.backbone,
        )
        # hidden state at the last *valid* prompt position produced token 0
        return cache, hidden[jnp.arange(b), seq_lens - 1]

    def pbody(i, carry):
        cache_f, lasts = carry
        off = i * c
        emb_c = jax.lax.dynamic_slice_in_dim(input_embeds, off, c, 0)
        len_c = jax.lax.dynamic_slice_in_dim(seq_lens, off, c, 0)
        hid_c, cache_c = model.apply(
            {"params": params},
            emb_c,
            positions[:c],
            len_c,
            make_kv_cache(cfg, c, s, dtype=model.dtype, quant=kv_quant),
            None,
            "prefill",
            method=Qwen2LM.backbone,
        )
        last_c = hid_c[jnp.arange(c), len_c - 1]
        cache_f = jax.tree.map(
            # chunk leaves are shorter in the S axis (s vs cache_max_len)
            # — batch is axis 1, every other start is 0 for k/v/scales
            lambda f, p: jax.lax.dynamic_update_slice(
                f, p, (0, off) + (0,) * (p.ndim - 2)
            ),
            cache_f, cache_c,
        )
        lasts = jax.lax.dynamic_update_slice_in_dim(
            lasts, last_c.astype(lasts.dtype), off, axis=0
        )
        return cache_f, lasts

    return jax.lax.fori_loop(
        0, -(-b // c), pbody,
        (cache, jnp.zeros((b, hid), model.dtype)),
    )


@functools.partial(
    jax.jit,
    # temperature is a TRACED operand (a sweep over temperatures must not
    # recompile the multi-minute fused program); top_p stays static — its
    # <1.0 branch gates a per-step [B, vocab] sort that greedy/plain
    # sampling should never pay
    static_argnames=(
        "model", "max_new_tokens", "stop_ids", "cache_max_len", "vocab_size",
        "do_sample", "top_p", "stop_sequences", "kv_quant",
        "prefill_chunk",
    ),
)
def greedy_generate(
    model: Qwen2LM,
    params,
    input_embeds: jnp.ndarray,  # [B, S, hidden] (post multimodal splice)
    seq_lens: jnp.ndarray,  # [B] valid prompt lengths
    *,
    max_new_tokens: int,
    stop_ids: Sequence[int],
    cache_max_len: int,
    vocab_size: int | None = None,
    do_sample: bool = False,
    temperature: float = 1.0,
    top_p: float = 1.0,
    rng: jnp.ndarray | None = None,
    stop_sequences: Tuple[Tuple[int, ...], ...] = (),
    kv_quant: bool = False,  # int8 KV cache (half the cache HBM + traffic)
    prefill_chunk: int = 0,  # >0: prefill ``chunk`` sequences at a time
) -> GenerateResult:
    """One fused dispatch for prefill + the whole decode loop — eager
    stage-by-stage dispatch costs seconds per call on remote runtimes.
    Greedy by default; do_sample enables temperature/top-p sampling.

    ``stop_sequences``: multi-token keyword stops, matched in-loop against
    the trailing generated ids — the tokenized equivalent of the reference's
    string-level KeywordsStoppingCriteria (mm_utils.py:418-449), without
    host round-trips per step. Single-token keywords belong in ``stop_ids``.
    """
    cfg: Qwen2Config = model.cfg
    b, s, hid = input_embeds.shape
    vocab_size = vocab_size or cfg.vocab_size
    assert cache_max_len >= s + max_new_tokens, (cache_max_len, s, max_new_tokens)
    # round the cache up to full 128-position tiles: a ragged S makes the
    # decode kernel jnp.pad a copy of the whole [B, Hkv, S, D] cache every
    # layer every step (decode_attention.py pads to its block size) — a
    # silent traffic tax on the weight-bandwidth-bound decode loop. The
    # tail positions are never attended (kv-length masking).
    cache_max_len = -(-cache_max_len // 128) * 128
    # single-token "sequences" are just extra stop ids
    stop_ids = tuple(stop_ids) + tuple(
        seq[0] for seq in stop_sequences if len(seq) == 1
    )
    stop_sequences = tuple(seq for seq in stop_sequences if len(seq) > 1)
    stop_arr = jnp.asarray(list(stop_ids), jnp.int32)

    cache = make_kv_cache(
        cfg, b, cache_max_len, dtype=model.dtype, quant=kv_quant
    )
    cache, last_hidden = prefill_cache(
        model, params, input_embeds, seq_lens, cache,
        kv_quant=kv_quant, prefill_chunk=prefill_chunk,
    )

    if rng is None:
        rng = jax.random.PRNGKey(0)

    def sample(h, key):  # [B, hidden] -> [B] next token
        logits = model.apply({"params": params}, h[:, None], method=Qwen2LM.logits)
        logits = _mask_vocab_logits(logits[:, 0].astype(jnp.float32), vocab_size)
        return _sample_token(logits, key, do_sample, temperature, top_p)

    rng, k0 = jax.random.split(rng)
    t0 = sample(last_hidden, k0)

    tokens = jnp.zeros((b, max_new_tokens), jnp.int32)
    hiddens = jnp.zeros((b, max_new_tokens, hid), model.dtype)
    tokens = tokens.at[:, 0].set(t0)
    hiddens = hiddens.at[:, 0].set(last_hidden.astype(model.dtype))
    done0 = jnp.isin(t0, stop_arr)
    gen_lens0 = jnp.ones((b,), jnp.int32)

    def cond(state):
        step, _, _, _, _, _, done, _, _ = state
        return jnp.logical_and(step < max_new_tokens, ~jnp.all(done))

    def body(state):
        step, tokens, hiddens, cache, cache_len, cur, done, gen_lens, key = state
        key, sub = jax.random.split(key)
        emb = model.apply(
            {"params": params}, cur[:, None], method=Qwen2LM.embed
        )
        h, cache = model.apply(
            {"params": params},
            emb,
            cache_len[:, None],
            None,
            cache,
            cache_len,
            "decode",
            method=Qwen2LM.backbone,
        )
        h = h[:, 0]
        nxt = sample(h, sub)
        # sequences already done keep emitting pad (their cache writes are
        # harmless: cache_len stops advancing once done)
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        tokens = tokens.at[:, step].set(jnp.where(done, tokens[:, step], nxt))
        hiddens = hiddens.at[:, step].set(
            jnp.where(done[:, None], hiddens[:, step], h.astype(model.dtype))
        )
        now_done = jnp.logical_or(done, jnp.isin(nxt, stop_arr))
        # multi-token keyword stop: trailing generated ids == keyword ids
        for seq in stop_sequences:
            k = len(seq)
            window = jax.lax.dynamic_slice_in_dim(
                tokens, step - (k - 1), k, axis=1
            )
            match = jnp.all(window == jnp.asarray(seq, jnp.int32)[None], axis=1)
            match = jnp.logical_and(match, step + 1 >= k)
            now_done = jnp.logical_or(now_done, jnp.logical_and(match, ~done))
        gen_lens = jnp.where(done, gen_lens, step + 1)
        cache_len = jnp.where(done, cache_len, cache_len + 1)
        return (
            step + 1, tokens, hiddens, cache, cache_len, nxt, now_done,
            gen_lens, key,
        )

    state = (
        jnp.asarray(1, jnp.int32),
        tokens,
        hiddens,
        cache,
        seq_lens,  # next write position == prompt length
        t0,
        done0,
        gen_lens0,
        rng,
    )
    state = jax.lax.while_loop(cond, body, state)
    _, tokens, hiddens, _, _, _, _, gen_lens, _ = state
    return GenerateResult(tokens=tokens, gen_lens=gen_lens, hidden=hiddens)


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "cache_max_len", "vocab_size", "do_sample", "top_p",
        "kv_quant", "prefill_chunk",
    ),
)
def prefill_start(
    model: Qwen2LM,
    params,
    input_embeds: jnp.ndarray,  # [B, S, hidden]
    seq_lens: jnp.ndarray,  # [B]
    *,
    cache_max_len: int,
    vocab_size: int | None = None,
    do_sample: bool = False,
    temperature: float = 1.0,
    top_p: float = 1.0,
    rng: jnp.ndarray | None = None,
    kv_quant: bool = False,
    prefill_chunk: int = 0,
):
    """Streaming front half: prefill + first token. Returns
    ``(cache, t0 [B], last_hidden [B, hidden], rng)`` — feed into
    :func:`decode_chunk` with ``cache_len = seq_lens``, ``cur = t0``.

    The fused ``greedy_generate`` stays the throughput path (one dispatch
    for the whole loop); this split exists for streaming serving, where
    tokens must surface every ``chunk`` steps — on this runtime an extra
    dispatch costs ~1.7 ms, so chunked decode trades a few ms per reply for
    incremental output and earlier host-side stop decisions."""
    cfg: Qwen2Config = model.cfg
    b, s, _ = input_embeds.shape
    vocab_size = vocab_size or cfg.vocab_size
    cache_max_len = -(-cache_max_len // 128) * 128
    cache = make_kv_cache(
        cfg, b, cache_max_len, dtype=model.dtype, quant=kv_quant
    )
    cache, last_hidden = prefill_cache(
        model, params, input_embeds, seq_lens, cache,
        kv_quant=kv_quant, prefill_chunk=prefill_chunk,
    )
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rng, k0 = jax.random.split(rng)
    logits = model.apply(
        {"params": params}, last_hidden[:, None], method=Qwen2LM.logits
    )
    logits = _mask_vocab_logits(logits[:, 0].astype(jnp.float32), vocab_size)
    t0 = _sample_token(logits, k0, do_sample, temperature, top_p)
    return cache, t0, last_hidden, rng


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "chunk", "stop_ids", "vocab_size", "do_sample", "top_p",
    ),
    donate_argnames=("cache",),  # the caller's old cache is dead state
)
def decode_chunk(
    model: Qwen2LM,
    params,
    cache,
    cache_len: jnp.ndarray,  # [B] next write position (incl. cur's slot)
    cur: jnp.ndarray,  # [B] last emitted token (its KV not yet written)
    done: jnp.ndarray,  # [B] bool
    *,
    chunk: int,
    stop_ids,
    vocab_size: int | None = None,
    do_sample: bool = False,
    temperature: float = 1.0,
    top_p: float = 1.0,
    rng: jnp.ndarray | None = None,
):
    """Streaming continuation: up to ``chunk`` decode steps from arbitrary
    loop state. Returns ``(tokens [B, chunk], n_emitted [B], hiddens
    [B, chunk, hidden], cache, cache_len, cur, done, rng)``. Token-identical
    to the fused loop at any chunking (tests/test_streaming.py); single-token
    ``stop_ids`` only — multi-token keyword stops are a host-side decision
    between chunks in the streaming path (the host sees decoded text and a
    late stop costs at most one chunk of wasted compute)."""
    cfg: Qwen2Config = model.cfg
    b = cur.shape[0]
    vocab_size = vocab_size or cfg.vocab_size
    stop_arr = jnp.asarray(list(stop_ids), jnp.int32)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def sample(h, key):
        logits = model.apply(
            {"params": params}, h[:, None], method=Qwen2LM.logits
        )
        logits = _mask_vocab_logits(logits[:, 0].astype(jnp.float32), vocab_size)
        return _sample_token(logits, key, do_sample, temperature, top_p)

    tokens = jnp.zeros((b, chunk), jnp.int32)
    hiddens = jnp.zeros((b, chunk, cfg.hidden_size), model.dtype)
    n = jnp.zeros((b,), jnp.int32)

    def cond(state):
        step, _, _, _, _, _, done, _, _ = state
        return jnp.logical_and(step < chunk, ~jnp.all(done))

    def body(state):
        step, tokens, hiddens, cache, cache_len, cur, done, n, key = state
        key, sub = jax.random.split(key)
        emb = model.apply(
            {"params": params}, cur[:, None], method=Qwen2LM.embed
        )
        h, cache = model.apply(
            {"params": params},
            emb,
            cache_len[:, None],
            None,
            cache,
            cache_len,
            "decode",
            method=Qwen2LM.backbone,
        )
        h = h[:, 0]
        nxt = sample(h, sub)
        tokens = tokens.at[:, step].set(jnp.where(done, tokens[:, step], nxt))
        hiddens = hiddens.at[:, step].set(
            jnp.where(done[:, None], hiddens[:, step], h.astype(model.dtype))
        )
        now_done = jnp.logical_or(done, jnp.isin(nxt, stop_arr))
        n = jnp.where(done, n, step + 1)
        cache_len = jnp.where(done, cache_len, cache_len + 1)
        cur = jnp.where(done, cur, nxt)
        return step + 1, tokens, hiddens, cache, cache_len, cur, now_done, n, key

    state = (
        jnp.asarray(0, jnp.int32), tokens, hiddens, cache, cache_len, cur,
        done, n, rng,
    )
    state = jax.lax.while_loop(cond, body, state)
    _, tokens, hiddens, cache, cache_len, cur, done, n, rng = state
    return tokens, n, hiddens, cache, cache_len, cur, done, rng


def stream_generate(
    model: Qwen2LM,
    params,
    input_embeds: jnp.ndarray,
    seq_lens: jnp.ndarray,
    *,
    max_new_tokens: int,
    stop_ids,
    cache_max_len: int,
    chunk: int = 16,
    vocab_size: int | None = None,
    do_sample: bool = False,
    temperature: float = 1.0,
    top_p: float = 1.0,
    rng: jnp.ndarray | None = None,
    kv_quant: bool = False,
    prefill_chunk: int = 0,
):
    """Host generator over chunked decode: each dispatch yields
    ``(token_ids [B, c], n_valid [B], hiddens [B, c, hidden], done [B])`` —
    row b's valid tokens are ``token_ids[b, :n_valid[b]]`` (the first yield
    is the prefill's token). Token-identical to ``greedy_generate`` under
    the same sampling state (the per-body rng split order matches); see
    :func:`decode_chunk` for the stop contract."""
    stop_ids = tuple(stop_ids)
    stop_arr = jnp.asarray(list(stop_ids), jnp.int32)
    b = input_embeds.shape[0]
    cache, t0, last_hidden, rng = prefill_start(
        model, params, input_embeds, seq_lens,
        cache_max_len=cache_max_len, vocab_size=vocab_size,
        do_sample=do_sample, temperature=temperature, top_p=top_p, rng=rng,
        kv_quant=kv_quant, prefill_chunk=prefill_chunk,
    )
    done = jnp.isin(t0, stop_arr)
    yield (
        t0[:, None], jnp.ones((b,), jnp.int32),
        last_hidden[:, None].astype(model.dtype), done,
    )
    cache_len = seq_lens
    cur = t0
    emitted = 1
    while emitted < max_new_tokens and not bool(jnp.all(done)):
        step = min(chunk, max_new_tokens - emitted)
        tokens, n, hiddens, cache, cache_len, cur, done, rng = decode_chunk(
            model, params, cache, cache_len, cur, done,
            chunk=step, stop_ids=stop_ids, vocab_size=vocab_size,
            do_sample=do_sample, temperature=temperature, top_p=top_p,
            rng=rng,
        )
        emitted += step
        yield tokens, n, hiddens, done


@functools.partial(jax.jit, static_argnames=("model",))
def forward_hidden(
    model: Qwen2LM, params, input_embeds: jnp.ndarray, seq_lens: jnp.ndarray
) -> jnp.ndarray:
    """Single full forward returning final-layer hidden states (the
    reference's path B for seg-style eval, videorefer_qwen2.py:461-518)."""
    b, s, _ = input_embeds.shape
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    hidden, _ = model.apply(
        {"params": params},
        input_embeds,
        positions,
        seq_lens,
        None,
        None,
        "train",
        method=Qwen2LM.backbone,
    )
    return hidden
