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


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "max_new_tokens", "stop_ids", "cache_max_len", "vocab_size"
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
) -> GenerateResult:
    """One fused dispatch for prefill + the whole decode loop — eager
    stage-by-stage dispatch costs seconds per call on remote runtimes."""
    cfg: Qwen2Config = model.cfg
    b, s, hid = input_embeds.shape
    vocab_size = vocab_size or cfg.vocab_size
    assert cache_max_len >= s + max_new_tokens, (cache_max_len, s, max_new_tokens)
    stop_arr = jnp.asarray(list(stop_ids), jnp.int32)

    cache = make_kv_cache(cfg, b, cache_max_len, dtype=model.dtype)

    # ---- prefill ----
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
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
    last_hidden = hidden[jnp.arange(b), seq_lens - 1]  # [B, hidden]

    def sample(h):  # [B, hidden] -> [B] greedy token
        logits = model.apply({"params": params}, h[:, None], method=Qwen2LM.logits)
        logits = _mask_vocab_logits(logits[:, 0].astype(jnp.float32), vocab_size)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    t0 = sample(last_hidden)

    tokens = jnp.zeros((b, max_new_tokens), jnp.int32)
    hiddens = jnp.zeros((b, max_new_tokens, hid), model.dtype)
    tokens = tokens.at[:, 0].set(t0)
    hiddens = hiddens.at[:, 0].set(last_hidden.astype(model.dtype))
    done0 = jnp.isin(t0, stop_arr)
    gen_lens0 = jnp.ones((b,), jnp.int32)

    def cond(state):
        step, _, _, _, _, _, done, _ = state
        return jnp.logical_and(step < max_new_tokens, ~jnp.all(done))

    def body(state):
        step, tokens, hiddens, cache, cache_len, cur, done, gen_lens = state
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
        nxt = sample(h)
        # sequences already done keep emitting pad (their cache writes are
        # harmless: cache_len stops advancing once done)
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        tokens = tokens.at[:, step].set(jnp.where(done, tokens[:, step], nxt))
        hiddens = hiddens.at[:, step].set(
            jnp.where(done[:, None], hiddens[:, step], h.astype(model.dtype))
        )
        now_done = jnp.logical_or(done, jnp.isin(nxt, stop_arr))
        gen_lens = jnp.where(done, gen_lens, step + 1)
        cache_len = jnp.where(done, cache_len, cache_len + 1)
        return (step + 1, tokens, hiddens, cache, cache_len, nxt, now_done, gen_lens)

    state = (
        jnp.asarray(1, jnp.int32),
        tokens,
        hiddens,
        cache,
        seq_lens,  # next write position == prompt length
        t0,
        done0,
        gen_lens0,
    )
    state = jax.lax.while_loop(cond, body, state)
    _, tokens, hiddens, _, _, _, _, gen_lens = state
    return GenerateResult(tokens=tokens, gen_lens=gen_lens, hidden=hiddens)


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
