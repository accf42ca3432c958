"""LoRA adapter training, TPU-native.

The reference trains PEFT LoRA adapters on the LLM's q_proj/v_proj
(reference: videorefer_trainer.py:75-90 find_all_linear_names with
target_modules=['q_proj','v_proj'], train.py:829-841 LoraConfig r=8
alpha=16) while the projector / region encoder / text FCs stay trainable
and get saved separately as non_lora_trainables
(videorefer_trainer.py:386-407).

TPU-first design: instead of wrapping module forward passes (the torch/PEFT
pattern), LoRA lives in *parameter space* — the train step materializes the
effective fused-qkv kernel ``W + (alpha/r) * concat(AqBq, 0_k, AvBv)`` and
runs the unmodified model. XLA fuses the rank-r outer product into the
parameter add; autodiff routes gradients to A/B only because the base
params enter as a non-differentiated argument. This keeps one compiled
model for full finetune, LoRA finetune, and inference-after-merge.

lora_dropout (input dropout on the adapter branch, reference rate 0.05)
has no parameter-space equivalent, so a ``dropout > 0`` config trains
PEFT's exact forward-term formulation instead — q/v +=
scale·(dropout(x)·A)·B inside the decoder layers (Qwen2LM ``lora_term``) —
while eval/serving always use the parameter-space merge. ``dropout == 0``
keeps the merged-parameter train step (identical code path to serving).

Checkpoints are written in the PEFT on-disk format (adapter_config.json +
adapter_model.bin + non_lora_trainables.bin) so
``checkpoints.merge_lora_from_dir`` — and the reference's own loader —
can consume them.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import UFVideoConfig

# non-LoRA modules that stay trainable during a LoRA finetune
# (reference: get_peft_state_non_lora_maybe_zero_3 keeps every
# requires_grad non-lora param — the mm adapters)
NON_LORA_TRAINABLE = ("projector", "region", "text_fcs")


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    r: int = 8
    alpha: float = 16.0
    dropout: float = 0.05  # reference train.py:829-841; >0 → forward-term step

    @property
    def scale(self) -> float:
        return self.alpha / self.r


def init_lora_params(
    cfg: UFVideoConfig, lcfg: LoRAConfig, rng: jax.Array
) -> Dict[str, Any]:
    """A/B factors for q and v column blocks of the fused qkv kernel,
    with PEFT init (A kaiming-uniform, B zeros). Layer axis leads,
    matching the scan-folded LLM params."""
    llm = getattr(cfg, "llm", cfg)  # UFVideoConfig or bare Qwen2Config
    L, h = llm.num_layers, llm.hidden_size
    qd = llm.num_heads * llm.head_dim
    kvd = llm.num_kv_heads * llm.head_dim
    kq, kv = jax.random.split(rng)
    bound = 1.0 / np.sqrt(h)

    def a_init(k):
        return jax.random.uniform(
            k, (L, h, lcfg.r), jnp.float32, -bound, bound
        )

    return {
        "q": {"a": a_init(kq), "b": jnp.zeros((L, lcfg.r, qd), jnp.float32)},
        "v": {"a": a_init(kv), "b": jnp.zeros((L, lcfg.r, kvd), jnp.float32)},
    }


def apply_lora(
    params: Dict[str, Any], lora: Dict[str, Any], cfg: UFVideoConfig,
    lcfg: LoRAConfig,
) -> Dict[str, Any]:
    """Effective params: fused qkv kernel += scale * [AqBq | 0_k | AvBv]."""
    llm = getattr(cfg, "llm", cfg)
    kvd = llm.num_kv_heads * llm.head_dim
    layers = params["llm"]["layers"]
    base = layers["self_attn_qkv_proj"]["kernel"]
    dq = jnp.einsum("lhr,lrd->lhd", lora["q"]["a"], lora["q"]["b"])
    dv = jnp.einsum("lhr,lrd->lhd", lora["v"]["a"], lora["v"]["b"])
    zk = jnp.zeros(dq.shape[:2] + (kvd,), dq.dtype)
    delta = (jnp.concatenate([dq, zk, dv], axis=-1) * lcfg.scale).astype(
        base.dtype
    )
    new_layers = dict(layers)
    new_layers["self_attn_qkv_proj"] = dict(layers["self_attn_qkv_proj"])
    new_layers["self_attn_qkv_proj"]["kernel"] = base + delta
    new_llm = dict(params["llm"])
    new_llm["layers"] = new_layers
    out = dict(params)
    out["llm"] = new_llm
    return out


def split_trainable(params: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """(frozen base, non-lora trainables) disjoint split of the param tree
    (disjoint so jit donation never sees the same buffer twice)."""
    non_lora = {k: params[k] for k in NON_LORA_TRAINABLE if k in params}
    base = {k: v for k, v in params.items() if k not in non_lora}
    return base, non_lora


def merge_for_eval(
    base: Dict[str, Any], trainable: Dict[str, Any], cfg: UFVideoConfig,
    lcfg: LoRAConfig,
) -> Dict[str, Any]:
    """Full effective param tree from (base, {lora, non_lora})."""
    p = dict(base)
    p.update(trainable["non_lora"])
    return apply_lora(p, trainable["lora"], cfg, lcfg)


def make_lora_train_step(model, optimizer, mesh, lcfg: LoRAConfig,
                         loss_fn=None, dropout_rng=None):
    """(init, step, shard_state) like make_train_step, but the optimizer
    only sees {lora, non_lora}; the base tree rides along frozen.

    With ``lcfg.dropout == 0`` the step trains through the parameter-space
    merge (unchanged model, one compiled graph for finetune and serving).
    With ``lcfg.dropout > 0`` it trains PEFT's exact forward-term
    formulation — q/v += scale·(dropout(x)·A)·B (reference train.py:829-841
    rate 0.05) — via a model instance built with ``lora_term``; the
    parameter-space merge remains the eval/serving path either way.
    ``loss_fn`` must accept (model, params, batch[, lora, dropout_rng]) —
    both shipped loss fns do."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.partition import DEFAULT_RULES, shardings_for
    from .train_step import Batch, TrainState, language_model_loss_fn
    from ..parallel.mesh import BATCH_SPEC

    cfg = model.cfg
    loss_fn = loss_fn or language_model_loss_fn
    if lcfg.dropout > 0.0:
        from ..models.ufvideo import UFVideoModel

        # rebuild WITH the caller's constructor state (ring for
        # sequence-parallel attention) — only lora_term changes
        model = UFVideoModel(
            cfg,
            ring=getattr(model, "ring", None),
            lora_term=(lcfg.scale, lcfg.dropout),
        )
        dropout_rng = (
            jax.random.PRNGKey(0) if dropout_rng is None else dropout_rng
        )

    def init(rng, params):
        base, non_lora = split_trainable(params)
        trainable = {
            "lora": init_lora_params(cfg, lcfg, rng),
            "non_lora": non_lora,
        }
        opt_state = optimizer.init(trainable)
        return {
            "step": jnp.zeros((), jnp.int32),
            "base": base,
            "trainable": trainable,
            "opt_state": opt_state,
        }

    def step(state, batch: Batch):
        def loss_of(trainable):
            if lcfg.dropout > 0.0:
                # forward-term: base params unmodified; adapter branch with
                # per-step dropout inside the layers
                p = dict(state["base"])
                p.update(trainable["non_lora"])
                rng = jax.random.fold_in(dropout_rng, state["step"])
                return loss_fn(
                    model, p, batch,
                    lora=trainable["lora"], dropout_rng=rng,
                )
            p = merge_for_eval(state["base"], trainable, cfg, lcfg)
            return loss_fn(model, p, batch)

        (loss, metrics), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(state["trainable"])
        import optax

        updates, new_opt = optimizer.update(
            grads, state["opt_state"], state["trainable"]
        )
        new_trainable = optax.apply_updates(state["trainable"], updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return {
            "step": state["step"] + 1,
            "base": state["base"],
            "trainable": new_trainable,
            "opt_state": new_opt,
        }, metrics

    def shard_state(state):
        sh = shardings_for(state, mesh, DEFAULT_RULES)
        return jax.tree.map(jax.device_put, state, sh)

    batch_sharding = NamedSharding(mesh, BATCH_SPEC)
    replicated = NamedSharding(mesh, P())
    dp = mesh.shape["data"] * mesh.shape["fsdp"]
    step_inner = jax.jit(step, donate_argnums=(0,))

    def step_jit(state, batch):
        def put(x):
            sh = (
                batch_sharding
                if getattr(x, "ndim", 0) >= 1 and x.shape[0] % dp == 0
                else replicated
            )
            return jax.device_put(x, sh)

        return step_inner(state, jax.tree.map(put, batch))

    return init, step_jit, shard_state


# ---------------------------------------------------------------------------
# PEFT-format checkpointing (adapter_config.json + adapter_model.bin +
# non_lora_trainables.bin), consumable by merge_lora_from_dir and by the
# reference's own loading path (model/__init__.py:63-106)
# ---------------------------------------------------------------------------

def save_lora_checkpoint(
    out_dir: str,
    lora: Dict[str, Any],
    cfg: UFVideoConfig,
    lcfg: LoRAConfig,
    non_lora_sd: Dict[str, Any] | None = None,
) -> None:
    import torch

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "adapter_config.json"), "w") as f:
        json.dump(
            {
                "peft_type": "LORA",
                "r": lcfg.r,
                "lora_alpha": lcfg.alpha,
                "lora_dropout": lcfg.dropout,
                "target_modules": ["q_proj", "v_proj"],
                "bias": "none",
                "task_type": "CAUSAL_LM",
            },
            f,
        )
    sd = {}
    for name in ("q", "v"):
        a = np.asarray(jax.device_get(lora[name]["a"]), np.float32)
        b = np.asarray(jax.device_get(lora[name]["b"]), np.float32)
        for layer in range(a.shape[0]):
            key = (
                f"base_model.model.model.layers.{layer}."
                f"self_attn.{name}_proj"
            )
            # torch Linear layout: A [r, in], B [out, r]
            sd[key + ".lora_A.weight"] = torch.from_numpy(a[layer].T.copy())
            sd[key + ".lora_B.weight"] = torch.from_numpy(b[layer].T.copy())
    torch.save(sd, os.path.join(out_dir, "adapter_model.bin"))
    if non_lora_sd:
        torch.save(
            dict(non_lora_sd),
            os.path.join(out_dir, "non_lora_trainables.bin"),
        )
