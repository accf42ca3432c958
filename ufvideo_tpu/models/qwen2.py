"""Qwen2 language model, TPU-native.

Replaces the reference's HF ``Qwen2ForCausalLM`` + flash-attn-2 CUDA stack
(reference: videorefer_qwen2.py:113-124, train.py:973) with a functional JAX
implementation: layers folded into one ``nn.scan`` (single-layer compile,
layer-stacked params), an explicit padded KV cache threaded through scan as
per-layer xs/ys, Pallas flash attention for prefill, and a fused XLA masked
softmax for single-token decode.

Four modes share one code path:
  - ``train``   : full causal forward, no cache.
  - ``prefill`` : causal forward that also writes k/v into the cache.
  - ``decode``  : single-token step against the cache.
  - ``verify``  : multi-token speculative-verification step against the
    cache with a ragged per-row causal mask (models/speculative.py).

The vocab is physically padded to a 256 multiple for MXU-friendly lm_head
matmuls; logits for padding ids are masked at sampling time.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import Qwen2Config
from ..ops.attention import attention, decode_attention
from ..ops.rope import apply_rope, rope_cos_sin


class RMSNorm(nn.Module):
    """HF-Qwen2-ordered RMSNorm: fp32 normalize, cast, then scale."""

    eps: float = 1e-6
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param(
            "scale", nn.initializers.ones, (x.shape[-1],), self.param_dtype
        )
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return xf.astype(self.dtype) * scale.astype(self.dtype)


def make_kv_cache(
    cfg: Qwen2Config,
    batch: int,
    max_len: int,
    dtype=jnp.bfloat16,
    quant: bool = False,
) -> Dict[str, jnp.ndarray]:
    """KV cache in [L, B, Hkv, S, D] layout — (S, D) are the tiled trailing
    dims the Pallas ragged decode kernel reads directly.

    ``quant=True`` stores int8 values with fp32 per-(position, head) scales
    (amax over D / 127): half the bf16 HBM footprint and read traffic. The
    scales commute exactly past both attention contractions (constant along
    the contracted axis), so dequantization folds into the kernel's
    score/prob rescale — no bf16 copy of the cache ever exists."""
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    if not quant:
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    return {
        "k": jnp.zeros(shape, jnp.int8),
        "v": jnp.zeros(shape, jnp.int8),
        "k_scale": jnp.zeros(shape[:-1], jnp.float32),
        "v_scale": jnp.zeros(shape[:-1], jnp.float32),
    }


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-position symmetric int8: x [..., D] -> (int8 values, f32 scales
    [...])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = amax / 127.0
    q = jnp.round(xf / jnp.maximum(scale, 1e-12)).astype(jnp.int8)
    return q, scale[..., 0]


class QuantDense(nn.Module):
    """Dense with int8 or int4 weight-only quantization (see
    ufvideo_tpu.quant; the TPU equivalent of the reference's bnb 8/4-bit
    load, model/__init__.py:50-60).

    int8: per-output-channel fp32 scales — the scale applies to the output,
    so the kernel is read from HBM as int8. int4: packed-int8 storage (two
    4-bit values per byte, nibble-unpacked in-jit — native jnp.int4 arrays
    cannot cross this runtime's dispatch boundary) with per-(input-group,
    column) scales; the group scale can't commute past the full
    contraction, so decode matvecs run a Pallas dequant-matmul on the
    packed bytes and larger (prefill) shapes blockwise-dequantize to the
    compute dtype for a single dot."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    bits: int = 8
    group: int = 64  # int4 scale group along the contraction axis

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        din = x.shape[-1]
        if self.bits == 8:
            q = self.param(
                "kernel_q", nn.initializers.zeros,
                (din, self.features), jnp.int8,
            )
            scale = self.param(
                "kernel_scale", nn.initializers.ones, (self.features,),
                jnp.float32,
            )
            rows = 1
            for d in x.shape[:-1]:
                rows *= d
            if (
                rows <= 32
                and jax.default_backend() == "tpu"
                and os.environ.get("UFVIDEO_INT8_MATVEC", "0") == "1"
            ):
                # decode-shaped matvec: hand-scheduled Pallas tile pipeline
                # (ops/quant_matmul.int8_matvec). Off by default — the
                # round-4 on-chip A/B decides (PERF.md); XLA's matvec streams
                # int8 weights at ~80% of HBM speed.
                from ..ops.quant_matmul import int8_matvec

                y = int8_matvec(x, q, scale).astype(self.dtype)
            else:
                y = jnp.dot(
                    x.astype(self.dtype), q.astype(self.dtype),
                    preferred_element_type=jnp.float32,
                )
                y = (y * scale).astype(self.dtype)
        else:
            assert self.bits == 4 and din % self.group == 0, (self.bits, din)
            from ..quant import unpack_int4  # packed-int8 4-bit storage

            g = din // self.group
            q8 = self.param(
                "kernel_q", nn.initializers.zeros,
                (din // 2, self.features), jnp.int8,
            )
            scale = self.param(
                "kernel_scale", nn.initializers.ones,
                (g, self.features), jnp.float32,
            )
            rows = 1
            for d in x.shape[:-1]:
                rows *= d
            if jax.default_backend() == "tpu" and rows <= 32:
                # decode-shaped matvec: Pallas dequant-matmul reads the
                # PACKED bytes (XLA would materialize a full int8 unpack to
                # HBM per step — measured 3.9 tok/s vs 90 int8)
                from ..ops.quant_matmul import int4_matmul

                y = int4_matmul(x, q8, scale, self.group).astype(self.dtype)
                if self.use_bias:
                    b = self.param(
                        "bias", nn.initializers.zeros, (self.features,),
                        self.dtype,
                    )
                    y = y + b
                return y
            # large-rows path (prefill): blockwise-dequantize the kernel to
            # the compute dtype and run ONE dot. (A grouped einsum that
            # scales f32 partials materializes [rows, g, features] — 36 GB
            # at batch-16 prefill; dequant is a ≤271 MB per-layer transient
            # and the same values the Pallas matvec kernel dequantizes.)
            q = unpack_int4(q8)
            w = (
                q.astype(jnp.float32).reshape(g, self.group, self.features)
                * scale[:, None, :]
            ).reshape(din, self.features).astype(self.dtype)
            y = jnp.dot(
                x.astype(self.dtype), w, preferred_element_type=jnp.float32
            ).astype(self.dtype)
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.dtype
            )
            y = y + b
        return y


def _quant_bits(quant) -> int:
    return 4 if quant in (4, "int4", "4bit") else 8


class Qwen2DecoderLayer(nn.Module):
    cfg: Qwen2Config
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16
    quant: Any = False
    # sequence parallelism: (mesh, seq_axis, batch_axis or None) — train-mode
    # attention runs as ring attention with the sequence sharded over
    # mesh[seq_axis] (ops/ring_attention.py); everything else in the layer is
    # token-local, so XLA shards it by propagation
    ring: Optional[Tuple] = None
    # forward-term LoRA: (alpha/r scale, dropout rate). When a ``lora_layer``
    # tree is passed to __call__, q/v get + scale·(drop(x)·A)·B — PEFT's
    # exact train-time formulation incl. lora_dropout (reference
    # train.py:829-841 rate 0.05). Serving/eval keep the parameter-space
    # merge (train/lora.py apply_lora); this path exists because dropout on
    # the adapter input has no parameter-space equivalent.
    lora_term: Optional[Tuple[float, float]] = None

    @nn.compact
    def __call__(
        self,
        carry: Tuple,
        cache_layer: Optional[Dict],
        lora_layer: Optional[Dict],
        mode: str,
    ):
        cfg = self.cfg
        x, cos, sin, seq_lens, cache_len = carry
        b, s, _ = x.shape

        if self.quant:
            dense = lambda feats, bias, name: QuantDense(
                feats, use_bias=bias, dtype=self.dtype,
                bits=_quant_bits(self.quant), name=name,
            )
        else:
            dense = lambda feats, bias, name: nn.Dense(
                feats, use_bias=bias, dtype=self.dtype,
                param_dtype=self.param_dtype, name=name,
            )
        norm = lambda name: RMSNorm(
            cfg.rms_norm_eps, self.dtype, self.param_dtype, name=name
        )

        # --- attention ---
        h = norm("input_layernorm")(x)
        nq = cfg.num_heads * cfg.head_dim
        nkv = cfg.num_kv_heads * cfg.head_dim
        # fused qkv: one weight stream per step (decode is weight-bandwidth
        # bound; converter concatenates the checkpoint's q/k/v)
        qkv = dense(nq + 2 * nkv, True, "self_attn_qkv_proj")(h)
        q = qkv[..., :nq].reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = qkv[..., nq : nq + nkv].reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        v = qkv[..., nq + nkv :].reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        if lora_layer is not None:
            scale, rate = self.lora_term or (1.0, 0.0)
            xr = h
            if rate > 0.0 and mode == "train":
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - rate, h.shape
                )
                xr = jnp.where(keep, h / (1.0 - rate), 0.0).astype(h.dtype)
            xf = xr.astype(jnp.float32)
            dq = (xf @ lora_layer["q"]["a"]) @ lora_layer["q"]["b"]
            dv = (xf @ lora_layer["v"]["a"]) @ lora_layer["v"]["b"]
            q = q + (scale * dq).astype(q.dtype).reshape(
                b, s, cfg.num_heads, cfg.head_dim
            )
            v = v + (scale * dv).astype(v.dtype).reshape(
                b, s, cfg.num_kv_heads, cfg.head_dim
            )
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        new_cache = cache_layer
        if mode == "train":
            if self.ring is not None:
                from ..ops.ring_attention import ring_attention

                mesh, seq_axis, batch_axis = self.ring
                o = ring_attention(
                    q, k, v, mesh, axis=seq_axis, causal=True,
                    kv_lens=seq_lens, batch_axis=batch_axis,
                )
            else:
                o = attention(q, k, v, causal=True, kv_lens=seq_lens)
        elif mode == "prefill":
            # cache layout [B, Hkv, S, D]
            kt = k.transpose(0, 2, 1, 3)
            vt = v.transpose(0, 2, 1, 3)
            new_cache = dict(cache_layer)
            if "k_scale" in cache_layer:  # int8 KV cache
                kq, ks = quantize_kv(kt)
                vq, vs = quantize_kv(vt)
                for name, val in (
                    ("k", kq), ("v", vq), ("k_scale", ks), ("v_scale", vs)
                ):
                    new_cache[name] = jax.lax.dynamic_update_slice(
                        cache_layer[name], val, (0,) * cache_layer[name].ndim
                    )
            else:
                new_cache["k"] = jax.lax.dynamic_update_slice(
                    cache_layer["k"], kt.astype(cache_layer["k"].dtype),
                    (0, 0, 0, 0),
                )
                new_cache["v"] = jax.lax.dynamic_update_slice(
                    cache_layer["v"], vt.astype(cache_layer["v"].dtype),
                    (0, 0, 0, 0),
                )
            o = attention(q, k, v, causal=True, kv_lens=seq_lens)
        elif mode == "verify":
            # multi-token speculative verification step (models/speculative.py):
            # write the s drafted tokens' k/v at per-sequence positions
            # cache_len + i, then attend with a per-row ragged causal mask —
            # q row i sees cache positions < cache_len + i + 1, exactly the
            # context sequential decode would have. Rejected drafts leave
            # stale cache entries past the accepted prefix; they sit beyond
            # the advanced cache_len, are never attended, and are
            # overwritten by later steps.
            bidx = jnp.arange(b)[:, None, None]
            hidx = jnp.arange(cfg.num_kv_heads)[None, :, None]
            pidx = cache_len[:, None, None] + jnp.arange(s)[None, None, :]
            kt = k.transpose(0, 2, 1, 3)  # [B, Hkv, s, D]
            vt = v.transpose(0, 2, 1, 3)
            new_cache = dict(cache_layer)
            if "k_scale" in cache_layer:  # int8 KV cache
                kq, ks = quantize_kv(kt)
                vq, vs = quantize_kv(vt)
                new_cache["k"] = cache_layer["k"].at[bidx, hidx, pidx].set(kq)
                new_cache["v"] = cache_layer["v"].at[bidx, hidx, pidx].set(vq)
                new_cache["k_scale"] = (
                    cache_layer["k_scale"].at[bidx, hidx, pidx].set(ks)
                )
                new_cache["v_scale"] = (
                    cache_layer["v_scale"].at[bidx, hidx, pidx].set(vs)
                )
                kc = (
                    new_cache["k"].astype(jnp.float32)
                    * new_cache["k_scale"][..., None]
                ).astype(self.dtype)
                vc = (
                    new_cache["v"].astype(jnp.float32)
                    * new_cache["v_scale"][..., None]
                ).astype(self.dtype)
            else:
                new_cache["k"] = cache_layer["k"].at[bidx, hidx, pidx].set(
                    kt.astype(cache_layer["k"].dtype)
                )
                new_cache["v"] = cache_layer["v"].at[bidx, hidx, pidx].set(
                    vt.astype(cache_layer["v"].dtype)
                )
                kc, vc = new_cache["k"], new_cache["v"]
            smax = kc.shape[2]
            # [B, s, Smax] ragged causal mask (the s×Smax score block is tiny
            # — s ≤ ~9 — so the XLA mask path costs nothing next to the
            # weight reads this step amortizes)
            vmask = (
                jnp.arange(smax)[None, None, :]
                <= (cache_len[:, None] + jnp.arange(s)[None, :])[..., None]
            )
            o = attention(
                q,
                kc.transpose(0, 2, 1, 3),  # [B, Smax, Hkv, D]
                vc.transpose(0, 2, 1, 3),
                mask=vmask,
                impl="xla",
            )
        elif mode == "decode":
            # write this step's k/v at per-sequence position cache_len
            bidx = jnp.arange(b)[:, None]
            hidx = jnp.arange(cfg.num_kv_heads)[None, :]
            new_cache = dict(cache_layer)
            if "k_scale" in cache_layer:  # int8 KV cache
                kq, ks = quantize_kv(k[:, 0])  # [B, Hkv, D] step values
                vq, vs = quantize_kv(v[:, 0])
                at = lambda c: c.at[bidx, hidx, cache_len[:, None]]
                new_cache["k"] = at(cache_layer["k"]).set(kq)
                new_cache["v"] = at(cache_layer["v"]).set(vq)
                new_cache["k_scale"] = at(cache_layer["k_scale"]).set(ks)
                new_cache["v_scale"] = at(cache_layer["v_scale"]).set(vs)
                o = decode_attention(
                    q, new_cache["k"], new_cache["v"], cache_len + 1,
                    k_scale=new_cache["k_scale"],
                    v_scale=new_cache["v_scale"],
                )
            else:
                kc = cache_layer["k"].at[bidx, hidx, cache_len[:, None]].set(
                    k[:, 0].astype(cache_layer["k"].dtype)
                )
                vc = cache_layer["v"].at[bidx, hidx, cache_len[:, None]].set(
                    v[:, 0].astype(cache_layer["v"].dtype)
                )
                new_cache = {"k": kc, "v": vc}
                o = decode_attention(q, kc, vc, cache_len + 1)
        else:
            raise ValueError(mode)

        o = o.reshape(b, s, cfg.num_heads * cfg.head_dim)
        x = x + dense(cfg.hidden_size, False, "self_attn_o_proj")(o)

        # --- mlp ---
        h = norm("post_attention_layernorm")(x)
        gate = dense(cfg.intermediate_size, False, "mlp_gate_proj")(h)
        up = dense(cfg.intermediate_size, False, "mlp_up_proj")(h)
        down = dense(cfg.hidden_size, False, "mlp_down_proj")(
            nn.silu(gate) * up
        )
        x = x + down

        return (x, cos, sin, seq_lens, cache_len), new_cache


class Qwen2LM(nn.Module):
    """Backbone + lm_head. Call ``embed`` / ``backbone`` / ``logits``
    separately so the composite model can splice multimodal embeddings
    between embed and backbone (the TPU-native equivalent of the reference's
    prepare_inputs_labels_for_multimodal, videorefer_arch.py:218-370)."""

    cfg: Qwen2Config
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16
    quant: Any = False  # False | True/'int8' | 'int4' (ufvideo_tpu.quant)
    ring: Optional[Tuple] = None  # (mesh, seq_axis, batch_axis) — see layer
    lora_term: Optional[Tuple[float, float]] = None  # (scale, dropout) — see layer
    # pipeline parallelism: (mesh, pipe_axis, num_microbatches, data_axis or
    # None) — the train-mode backbone runs as a GPipe fill-drain pipeline
    # over mesh[pipe_axis] (parallel/pipeline.py): the scan-stacked layer
    # params shard over stages, microbatched activations flow via ppermute.
    # Train path only (decode/prefill/verify and LoRA stay on the dense
    # scan); results equal the dense scan to float epsilon, grads included.
    pp: Optional[Tuple] = None

    def setup(self):
        cfg = self.cfg
        if self.pp is not None and self.ring is not None:
            # the pipelined path rebuilds a standalone template layer
            # WITHOUT ring, so combining them would silently drop the
            # requested sequence parallelism — refuse instead
            raise ValueError(
                "pp and ring are mutually exclusive: the pipelined layer "
                "template does not carry ring (sequence-parallel) attention"
            )
        self.embed_tokens = nn.Embed(
            cfg.padded_vocab_size, cfg.hidden_size,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="embed_tokens",
        )
        self.norm = RMSNorm(
            cfg.rms_norm_eps, self.dtype, self.param_dtype, name="norm"
        )
        if self.quant:
            self.lm_head = QuantDense(
                cfg.padded_vocab_size, use_bias=False, dtype=self.dtype,
                bits=_quant_bits(self.quant), name="lm_head",
            )
        else:
            self.lm_head = nn.Dense(
                cfg.padded_vocab_size, use_bias=False, dtype=self.dtype,
                param_dtype=self.param_dtype, name="lm_head",
            )
        layer_cls = Qwen2DecoderLayer
        if cfg.remat:
            # gradient checkpointing (reference train_1121v1.sh
            # --gradient_checkpointing): recompute each layer's forward in
            # the backward pass instead of storing activations; dots are
            # saved (policy) so the MXU work is not redone
            layer_cls = nn.remat(
                layer_cls,
                static_argnums=(4,),  # mode (index incl. module self)
                policy=jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
            )
        self.layers = nn.scan(
            layer_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0, 0, nn.broadcast),  # (cache, lora, mode)
            out_axes=0,
            length=cfg.num_layers,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )(cfg, self.dtype, self.param_dtype, self.quant, self.ring,
          self.lora_term, name="layers")

    def embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.embed_tokens(jnp.maximum(input_ids, 0))

    def _run_layers(self, x, positions, seq_lens, cache, cache_len, mode,
                    lora=None):
        cfg = self.cfg
        cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
        if (
            self.pp is not None
            and mode == "train"
            and cache is None
            and lora is None
            and not self.is_initializing()
        ):
            x = self._run_layers_pipelined(x, cos, sin, seq_lens, cache_len)
            return self.norm(x), None
        carry = (x, cos, sin, seq_lens, cache_len)
        carry, new_cache = self.layers(carry, cache, lora, mode)
        return self.norm(carry[0]), new_cache

    def _run_layers_pipelined(self, x, cos, sin, seq_lens, cache_len):
        """Train-mode layer stack as a pipeline over ``self.pp``'s mesh.

        Reads the scanned stack's own (layer-stacked) params and re-applies
        them through a standalone ``Qwen2DecoderLayer`` inside
        ``pipeline_apply`` — the same math, re-scheduled; gradients flow
        through the read."""
        from jax.sharding import PartitionSpec as P

        from ..parallel.pipeline import pipeline_apply

        mesh, pipe_axis, n_mb, data_axis = self.pp
        b = x.shape[0]
        if b % n_mb != 0:
            raise ValueError(f"batch {b} not divisible by microbatches {n_mb}")
        to_mb = lambda a: a.reshape((n_mb, b // n_mb) + a.shape[1:])
        carries = (
            to_mb(x), to_mb(cos), to_mb(sin), to_mb(seq_lens),
            to_mb(cache_len),
        )
        carry_spec = (
            P(data_axis, None, None),
            P(data_axis, None, None),
            P(data_axis, None, None),
            P(data_axis),
            P(data_axis),
        )
        # parent=None: functional use — this template is applied with the
        # scanned stack's own params, never registered as a submodule
        layer = Qwen2DecoderLayer(
            self.cfg, self.dtype, self.param_dtype, self.quant, parent=None
        )

        def layer_fn(layer_params, carry):
            return layer.apply(
                {"params": layer_params}, carry, None, None, "train"
            )[0]

        out = pipeline_apply(
            layer_fn,
            self.layers.variables["params"],
            carries,
            mesh,
            pipe_axis=pipe_axis,
            carry_spec=carry_spec,
            remat=self.cfg.remat,
            out_select=lambda c: c[0],
        )
        return out.reshape(x.shape)

    def backbone(
        self,
        input_embeds: jnp.ndarray,  # [B, S, hidden]
        positions: jnp.ndarray,  # [B, S] int32
        seq_lens: Optional[jnp.ndarray] = None,  # [B] valid lengths
        cache: Optional[Dict] = None,  # layer-stacked kv cache
        cache_len: Optional[jnp.ndarray] = None,  # [B] for decode
        mode: str = "train",
        lora: Optional[Dict] = None,  # layer-stacked LoRA factors (see layer)
    ):
        """Returns (final hidden states [B, S, hidden], new cache or None)."""
        b, s, _ = input_embeds.shape
        if seq_lens is None:
            seq_lens = jnp.full((b,), s, jnp.int32)
        if cache_len is None:
            cache_len = jnp.zeros((b,), jnp.int32)
        x = input_embeds.astype(self.dtype)
        return self._run_layers(
            x, positions, seq_lens, cache, cache_len, mode, lora
        )

    def logits(self, hidden: jnp.ndarray) -> jnp.ndarray:
        return self.lm_head(hidden)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        seq_lens: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Plain text-only causal LM forward → logits (training/eval path)."""
        b, s = input_ids.shape
        x = self.embed(input_ids)
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
        hidden, _ = self.backbone(x, positions, seq_lens, mode="train")
        return self.logits(hidden)
