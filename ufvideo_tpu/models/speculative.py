"""Prompt-lookup speculative greedy decoding.

Beyond-reference serving lever, TPU-motivated: bs-1 greedy decode is
weight-bandwidth-bound (PERF.md — every step reads all ~7.6 GB of int8
weights for ONE token, a ~117 tok/s ceiling on a v5e). Verifying K drafted
tokens in a single multi-token forward reads the weights once for up to K+1
emitted tokens, so any accepted draft is a nearly-free extra token — the
only way past the weight-bandwidth floor without more chips or lower
precision. Drafts come from prompt lookup (Saxena 2023's "prompt lookup
decoding"; assisted-generation n-gram matching in HF transformers): find the
most recent occurrence of the last bigram in the token history (prompt text
+ generated so far) and propose the K tokens that followed it. No draft
model, no extra weights, and video-description / referring outputs echo
prompt phrases often enough for real acceptance rates.

Exactness: acceptance keeps the longest prefix of drafts that match the
verify pass's own greedy argmax — position i of the verification block
attends exactly the context sequential decode would have (qwen2.py "verify"
mode), so emitted tokens equal plain greedy decoding's token-for-token
(tests/test_speculative.py pins spec == greedy on random tiny models).
Greedy only: sampling acceptance needs the speculative-sampling residual
scheme and the reference pipeline decodes greedily everywhere
(ufvideo/__init__.py:114-117).

The whole loop is one jitted ``lax.while_loop``; each iteration embeds
[cur, draft_0..draft_{K-1}], runs one "verify" forward against the KV cache
(k/v written at ragged per-sequence positions), accepts the matching prefix
plus the model's own next token, and advances per-sequence write positions.
Rejected drafts' stale cache rows sit beyond the advanced ``cache_len`` and
are overwritten by later steps. ``spec_stream_generate`` runs the SAME
iteration as one jitted dispatch per draft→verify round, so speculation and
streaming compose (api.generate_stream picks it when ``cfg.spec_decode`` is
set).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..configs import Qwen2Config
from .generate import GenerateResult, _mask_vocab_logits, prefill_cache
from .qwen2 import Qwen2LM, make_kv_cache


class SpecResult(NamedTuple):
    tokens: jnp.ndarray  # [B, max_new] generated ids (pad after stop)
    gen_lens: jnp.ndarray  # [B] number of generated tokens incl. stop token
    hidden: jnp.ndarray  # [B, max_new, hidden] hidden that produced each token
    n_iters: jnp.ndarray  # [] model forwards used (vs gen_lens.max() greedy)
    n_drafted: jnp.ndarray  # [B] draft tokens proposed
    n_accepted: jnp.ndarray  # [B] draft tokens accepted

    def as_generate_result(self) -> GenerateResult:
        return GenerateResult(
            tokens=self.tokens, gen_lens=self.gen_lens, hidden=self.hidden
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "max_new_tokens", "stop_ids", "cache_max_len", "vocab_size",
        "draft_k", "kv_quant", "prefill_chunk",
    ),
)
def spec_generate(
    model: Qwen2LM,
    params,
    input_embeds: jnp.ndarray,  # [B, S, hidden] (post multimodal splice)
    seq_lens: jnp.ndarray,  # [B] valid prompt lengths
    prompt_ids: jnp.ndarray,  # [B, S] text ids for lookup (-1 at non-text
    #                            positions: video/region splice slots, pad)
    *,
    max_new_tokens: int,
    stop_ids: Sequence[int],
    cache_max_len: int,
    draft_k: int = 4,
    vocab_size: int | None = None,
    kv_quant: bool = False,
    prefill_chunk: int = 0,
) -> SpecResult:
    """Greedy generation with prompt-lookup speculation; same contract as
    ``greedy_generate`` restricted to greedy (plus per-run speculation
    diagnostics). ``cache_max_len`` must cover ``s + max_new_tokens +
    draft_k`` — a verification block can write ``draft_k`` positions past
    the final accepted token."""
    cfg: Qwen2Config = model.cfg
    b, s, hid = input_embeds.shape
    k = int(draft_k)
    assert k >= 1, k
    vocab_size = vocab_size or cfg.vocab_size
    assert cache_max_len >= s + max_new_tokens + k, (
        cache_max_len, s, max_new_tokens, k
    )
    cache_max_len = -(-cache_max_len // 128) * 128  # full 128-position tiles

    state = _spec_init(
        model, params, input_embeds, seq_lens, prompt_ids,
        cache_max_len=cache_max_len, max_new_tokens=max_new_tokens,
        stop_ids=stop_ids, vocab_size=vocab_size, kv_quant=kv_quant,
        prefill_chunk=prefill_chunk,
    )

    def cond(state):
        it, _, _, _, _, _, done, _, _, _, _ = state
        return jnp.logical_and(it < max_new_tokens, ~jnp.all(done))

    def body(state):
        return _spec_body(
            model, params, state, k=k, stop_ids=stop_ids,
            vocab_size=vocab_size, max_new_tokens=max_new_tokens,
            prompt_len=s,
        )

    state = jax.lax.while_loop(cond, body, state)
    (it, tokens, hiddens, _, _, _, _, gen_lens, _, n_drafted,
     n_accepted) = state
    return SpecResult(
        tokens=tokens, gen_lens=gen_lens, hidden=hiddens, n_iters=it,
        n_drafted=n_drafted, n_accepted=n_accepted,
    )


def _argmax_tokens(model, params, h, vocab_size):  # [B, T, hidden] -> [B, T]
    logits = model.apply({"params": params}, h, method=Qwen2LM.logits)
    logits = _mask_vocab_logits(logits.astype(jnp.float32), vocab_size)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def _spec_init(
    model, params, input_embeds, seq_lens, prompt_ids, *,
    cache_max_len, max_new_tokens, stop_ids, vocab_size, kv_quant,
    prefill_chunk,
):
    """Prefill + first token + loop-state construction (shared by the fused
    loop and the streaming per-iteration path)."""
    cfg: Qwen2Config = model.cfg
    b, s, hid = input_embeds.shape
    stop_arr = jnp.asarray(list(stop_ids), jnp.int32)
    cache = make_kv_cache(
        cfg, b, cache_max_len, dtype=model.dtype, quant=kv_quant
    )
    cache, last_hidden = prefill_cache(
        model, params, input_embeds, seq_lens, cache,
        kv_quant=kv_quant, prefill_chunk=prefill_chunk,
    )
    t0 = _argmax_tokens(model, params, last_hidden[:, None], vocab_size)[:, 0]

    # token history for n-gram lookup: [prompt text ids | generated], the
    # generated region at the static offset S (prompt pad slots between a
    # short prompt and S hold -1 and never match a real bigram; losing
    # matches that straddle the prompt/generation boundary costs only
    # acceptance rate, never correctness)
    lh = s + max_new_tokens
    hist = jnp.full((b, lh), -1, jnp.int32)
    hist = hist.at[:, :s].set(
        jnp.where(
            jnp.arange(s)[None, :] < seq_lens[:, None],
            prompt_ids.astype(jnp.int32),
            -1,
        )
    )
    hist = hist.at[:, s].set(t0)

    tokens = jnp.zeros((b, max_new_tokens), jnp.int32)
    hiddens = jnp.zeros((b, max_new_tokens, hid), model.dtype)
    tokens = tokens.at[:, 0].set(t0)
    hiddens = hiddens.at[:, 0].set(last_hidden.astype(model.dtype))
    done0 = jnp.isin(t0, stop_arr)
    return (
        jnp.asarray(1, jnp.int32), tokens, hiddens, cache, seq_lens, t0,
        done0, jnp.ones((b,), jnp.int32), hist, jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.int32),
    )


def _spec_body(
    model, params, state, *, k, stop_ids, vocab_size, max_new_tokens,
    prompt_len,
):
    """One draft→verify→accept iteration over the 11-tuple loop state."""
    s = prompt_len
    stop_arr = jnp.asarray(list(stop_ids), jnp.int32)
    (it, tokens, hiddens, cache, cache_len, cur, done, gen_lens, hist,
     n_drafted, n_accepted) = state
    b = cur.shape[0]
    lh = hist.shape[1]
    bidx = jnp.arange(b)[:, None]
    kidx = jnp.arange(k + 1)[None, :]

    def draft_tokens(hist, end):
        """Most recent n-gram match → the K tokens that followed it, trying
        the last trigram first (longer context = fewer spurious matches =
        higher acceptance), then the last bigram. ``end`` [B]: one past the
        last real history entry."""
        t3 = jnp.take_along_axis(
            hist, jnp.maximum(end - 3, 0)[:, None], axis=1
        )  # [B, 1]
        t2 = jnp.take_along_axis(hist, (end - 2)[:, None], axis=1)
        t1 = jnp.take_along_axis(hist, (end - 1)[:, None], axis=1)

        def last_match(n, ts):
            """Latest j where hist[j:j+n] == ts, with the K-token draft
            window inside real history → (any [B], draft start [B])."""
            cand = jnp.ones((hist.shape[0], lh - n + 1), bool)
            for i, t in enumerate(ts):
                cand = cand & (hist[:, i : lh - n + 1 + i] == t)
            jpos = jnp.arange(lh - n + 1)[None, :]
            valid = (
                cand
                & (jpos + n + k <= end[:, None])
                # exclude the trivial self-match ending at the history tail
                & (jpos != (end - n)[:, None])
                # the n-gram must be real tokens (no pad-run matching)
                & (ts[0] >= 0)
                & (end >= n)[:, None]
            )
            any_m = valid.any(axis=1)
            j_star = (lh - n) - jnp.argmax(valid[:, ::-1], axis=1)
            return any_m, j_star + n

        any3, start3 = last_match(3, (t3, t2, t1))
        any2, start2 = last_match(2, (t2, t1))
        any_m = any3 | any2
        start = jnp.where(any3, start3, jnp.where(any2, start2, 0))
        d = jnp.take_along_axis(
            hist, start[:, None] + jnp.arange(k)[None, :], axis=1
        )
        # without a match, propose the last token repeated — free to verify
        # (the forward runs anyway) and right for runs of repeated tokens
        return jnp.where(any_m[:, None], d, t1)

    end = s + gen_lens
    draft = draft_tokens(hist, end)  # [B, K]
    block = jnp.concatenate([cur[:, None], draft], axis=1)  # [B, K+1]
    emb = model.apply(
        {"params": params}, jnp.maximum(block, 0), method=Qwen2LM.embed
    )
    positions = cache_len[:, None] + kidx
    h, cache = model.apply(
        {"params": params},
        emb,
        positions,
        None,
        cache,
        cache_len,
        "verify",
        method=Qwen2LM.backbone,
    )
    preds = _argmax_tokens(model, params, h, vocab_size)
    # preds[i] follows block[:i+1]

    # longest accepted draft prefix, then the model's own next token.
    # Emitted tokens are preds verbatim: preds[i] == draft[i] on every
    # accepted position by construction, and preds[a] is the bonus token.
    acc = jnp.cumprod((preds[:, :k] == draft).astype(jnp.int32), axis=1)
    a = jnp.sum(acc, axis=1)  # [B] in 0..K
    emitted = preds
    count = a + 1
    # truncate at the first stop token inside the emitted prefix
    hit = jnp.isin(emitted, stop_arr) & (kidx < count[:, None])
    any_hit = hit.any(axis=1)
    first_hit = jnp.argmax(hit, axis=1)
    count = jnp.where(any_hit, first_hit + 1, count)
    count = jnp.where(done, 0, jnp.minimum(count, max_new_tokens - gen_lens))

    wpos = gen_lens[:, None] + kidx
    wvalid = kidx < count[:, None]
    safe = jnp.where(wvalid, wpos, max_new_tokens)  # OOB rows dropped
    tokens = tokens.at[bidx, safe].set(emitted, mode="drop")
    hiddens = hiddens.at[bidx, safe].set(h.astype(model.dtype), mode="drop")
    hist = hist.at[bidx, jnp.where(wvalid, s + wpos, lh)].set(
        emitted, mode="drop"
    )

    new_done = done | any_hit | (gen_lens + count >= max_new_tokens)
    # cache holds [cur | accepted drafts]; the bonus token is next
    # iteration's cur and gets its KV written then
    adv = jnp.where(done, 0, 1 + jnp.minimum(a, jnp.maximum(count - 1, 0)))
    new_cur = jnp.take_along_axis(
        emitted, jnp.maximum(count - 1, 0)[:, None], axis=1
    )[:, 0]
    new_cur = jnp.where(count > 0, new_cur, cur)
    n_drafted = n_drafted + jnp.where(done, 0, k)
    n_accepted = n_accepted + jnp.where(done, 0, jnp.maximum(count - 1, 0))
    return (
        it + 1, tokens, hiddens, cache, cache_len + adv, new_cur,
        new_done, gen_lens + count, hist, n_drafted, n_accepted,
    )


_spec_prefill_jit = functools.partial(
    jax.jit,
    static_argnames=(
        "model", "cache_max_len", "max_new_tokens", "stop_ids", "vocab_size",
        "kv_quant", "prefill_chunk",
    ),
)(_spec_init)

_spec_step_jit = functools.partial(
    jax.jit,
    static_argnames=(
        "model", "k", "stop_ids", "vocab_size", "max_new_tokens",
        "prompt_len",
    ),
)(_spec_body)


@jax.jit
@functools.partial(jax.jit, donate_argnums=(0,))
def spec_slot_admit(state, slot, scratch_cache, t0, seq_len, hist_row,
                    src=0):
    """Reset row ``slot`` of a persistent spec-loop state for a newly
    admitted request (engine.py spec mode): copy row ``src`` of the
    request's prefilled scratch cache (the admission pipeline prefills
    queued requests in ONE batched dispatch, so the scratch may hold
    several requests' rows) into the slot, seed its token/history buffers
    with the prefill's first token, and mark it live. Other rows are
    untouched — every per-row op in ``_spec_body`` is row-independent, so
    in-flight slots keep decoding bit-identically. Jitted (the eager
    version cost ~10 dispatches per admission — pure RTT on the remote
    runtime) with the old state donated (the cache rewrite would otherwise
    double the multi-GB state in HBM)."""
    (it, tokens, hiddens, cache, cache_len, cur, done, gen_lens, hist,
     n_drafted, n_accepted) = state
    cache = jax.tree.map(
        lambda c, p: jax.lax.dynamic_update_slice(
            c,
            jax.lax.dynamic_slice_in_dim(p, src, 1, axis=1).astype(c.dtype),
            (0, slot) + (0,) * (p.ndim - 2),
        ),
        cache, scratch_cache,
    )
    s = hist.shape[1] - tokens.shape[1]  # static prompt-buffer offset
    tokens = tokens.at[slot].set(0).at[slot, 0].set(t0)
    hiddens = hiddens.at[slot].set(0)
    cache_len = cache_len.at[slot].set(seq_len)
    cur = cur.at[slot].set(t0)
    done = done.at[slot].set(False)
    gen_lens = gen_lens.at[slot].set(1)
    hist = hist.at[slot].set(hist_row).at[slot, s].set(t0)
    n_drafted = n_drafted.at[slot].set(0)
    n_accepted = n_accepted.at[slot].set(0)
    return (
        it, tokens, hiddens, cache, cache_len, cur, done, gen_lens, hist,
        n_drafted, n_accepted,
    )


@jax.jit
def spec_set_done(state, mask):
    """OR a host-side done mask into the state (per-slot budget/stop-string
    retirement decided between steps)."""
    lst = list(state)
    lst[6] = jnp.logical_or(lst[6], mask)
    return tuple(lst)


def spec_stream_generate(
    model: Qwen2LM,
    params,
    input_embeds: jnp.ndarray,
    seq_lens: jnp.ndarray,
    prompt_ids: jnp.ndarray,
    *,
    max_new_tokens: int,
    stop_ids: Sequence[int],
    cache_max_len: int,
    draft_k: int = 4,
    vocab_size: int | None = None,
    kv_quant: bool = False,
    prefill_chunk: int = 0,
):
    """Streaming speculative decode: one jitted draft→verify iteration per
    dispatch, yielding ``(tokens [B, max_new], new_gen_lens [B], hiddens,
    done [B])`` after each — the consumer slices
    ``tokens[b, prev_len:new_len]`` for the fresh tokens. Emits the same
    stream as ``spec_generate`` (and therefore plain greedy), token for
    token, while surfacing 1..K+1 tokens per weight pass — streaming AND
    speculation compose."""
    cfg: Qwen2Config = model.cfg
    b, s, _ = input_embeds.shape
    k = int(draft_k)
    vocab_size = vocab_size or cfg.vocab_size
    assert cache_max_len >= s + max_new_tokens + k, (
        cache_max_len, s, max_new_tokens, k
    )
    cache_max_len = -(-cache_max_len // 128) * 128
    stop_ids = tuple(stop_ids)
    state = _spec_prefill_jit(
        model, params, input_embeds, seq_lens, prompt_ids,
        cache_max_len=cache_max_len, max_new_tokens=max_new_tokens,
        stop_ids=stop_ids, vocab_size=vocab_size, kv_quant=kv_quant,
        prefill_chunk=prefill_chunk,
    )
    yield state[1], state[7], state[2], state[6]  # tokens, gen_lens, hiddens, done
    while int(state[0]) < max_new_tokens and not bool(jnp.all(state[6])):
        state = _spec_step_jit(
            model, params, state, k=k, stop_ids=stop_ids,
            vocab_size=vocab_size, max_new_tokens=max_new_tokens,
            prompt_len=s,
        )
        yield state[1], state[7], state[2], state[6]
