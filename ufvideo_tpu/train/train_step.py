"""pjit training step: ZeRO-equivalent FSDP sharding over the device mesh.

The reference trains with HF Trainer + DeepSpeed ZeRO-1/2 over NCCL
(reference: scripts/zero1.json, zero2.json, videorefer_trainer.py). The
TPU-native equivalent: params/optimizer state sharded by the partition rules
(parallel/partition.py), batch sharded over (data, fsdp), XLA inserting the
all-gathers/reduce-scatters over ICI. Gradient clipping 1.0 and AdamW +
warmup-cosine match the reference schedule (zero2.json, train_1121v1.sh).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import UFVideoConfig
from ..models.qwen2 import Qwen2LM
from ..models.ufvideo import UFVideoModel
from ..parallel.mesh import BATCH_SPEC
from ..parallel.partition import DEFAULT_RULES, shardings_for
from .losses import causal_lm_loss


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_optimizer(
    lr: float = 2e-5,
    *,
    warmup_ratio: float = 0.03,
    total_steps: int = 10_000,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    grad_clip: float = 1.0,
    mm_projector_lr: Optional[float] = None,
) -> optax.GradientTransformation:
    """AdamW + linear-warmup cosine (reference: train_1121v1.sh lr 2e-5,
    warmup 0.03, cosine; zero2.json grad clip 1.0). ``mm_projector_lr``
    reproduces the trainer's separate projector learning rate
    (videorefer_trainer.py:261-341)."""
    warmup = max(int(total_steps * warmup_ratio), 1)
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=lr,
        warmup_steps=warmup,
        decay_steps=total_steps,
        end_value=0.0,
    )
    base = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay),
    )
    if mm_projector_lr is None:
        return base

    proj_schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=mm_projector_lr,
        warmup_steps=warmup,
        decay_steps=total_steps,
        end_value=0.0,
    )
    def label_fn(params):
        return {
            k: ("projector" if k == "projector" else "base") for k in params
        }

    # ONE global clip across BOTH groups, applied before the per-group
    # AdamWs — the reference (HF Trainer param groups, zero2.json clip 1.0)
    # clips a single global norm over all trainable params; clipping inside
    # each group would under-clip whenever both groups carry gradient
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.multi_transform(
            {
                "base": optax.adamw(
                    schedule, b1=b1, b2=b2, weight_decay=weight_decay
                ),
                "projector": optax.adamw(
                    proj_schedule, b1=b1, b2=b2, weight_decay=weight_decay
                ),
            },
            label_fn,
        ),
    )


def freeze_mask(
    params: Any,
    frozen_top_keys=("vision", "sam"),
    train_sam_mask_decoder: bool = True,
) -> Any:
    """Trainable mask matching the reference's freezing policy
    (train.py:861-916: vision tower frozen, SAM2 frozen, text_hidden_fcs,
    projector, region encoder and LLM trainable). ``train_sam_mask_decoder``
    mirrors the reference's train_mask_decoder — DEFAULT TRUE (train.py:94;
    videorefer_arch.py:131-133 re-enables requires_grad on
    sam_mask_decoder inside the otherwise-frozen SAM2)."""

    def mark(key, tree):
        if key not in frozen_top_keys:
            return jax.tree.map(lambda _: True, tree)
        if key == "sam" and train_sam_mask_decoder and isinstance(tree, dict):
            return {
                k: jax.tree.map(lambda _: k == "sam_mask_decoder", v)
                for k, v in tree.items()
            }
        return jax.tree.map(lambda _: False, tree)

    return {k: mark(k, v) for k, v in params.items()}


def with_frozen(
    optimizer: optax.GradientTransformation, mask: Any
) -> optax.GradientTransformation:
    """Zero updates (and skip optimizer state) for frozen params."""
    return optax.multi_transform(
        {True: optimizer, False: optax.set_to_zero()},
        jax.tree.map(bool, mask),
    )


class Batch(NamedTuple):
    """One spliced multimodal training batch (static shapes)."""

    pixels: jnp.ndarray  # [B, T, H, W, 3]
    text_ids: jnp.ndarray  # [B, Tt]
    src_kind: jnp.ndarray  # [B, S]
    src_idx: jnp.ndarray  # [B, S]
    seq_lens: jnp.ndarray  # [B]
    labels: jnp.ndarray  # [B, S]


def language_model_loss_fn(
    model: UFVideoModel, params, batch: Batch,
    lora=None, dropout_rng=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """CE portion of the reference loss (videorefer_qwen2.py:199-214).
    The SAM2 mask losses are added by the segmentation train step once the
    mask decoder is attached. ``lora``/``dropout_rng``: forward-term LoRA
    factors + rng for lora_dropout (train/lora.py; requires a model built
    with ``lora_term``)."""
    cfg = model.cfg
    video_feats = model.encode_video(params, batch.pixels)
    embeds = model.splice_embeds(
        params, batch.text_ids, batch.src_kind, batch.src_idx, video_feats, None
    )
    b, s, _ = embeds.shape
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
    hidden, _ = model.llm.apply(
        {"params": params["llm"]}, embeds, positions, batch.seq_lens,
        None, None, "train", lora, method=Qwen2LM.backbone, rngs=rngs,
    )
    logits = model.llm.apply(
        {"params": params["llm"]}, hidden, method=Qwen2LM.logits
    )
    ce = causal_lm_loss(logits, batch.labels, cfg.llm.vocab_size)
    loss = cfg.ce_loss_weight * ce
    return loss, {"ce_loss": ce, "loss": loss}


def _build_step(model, optimizer, loss_fn, trainable_mask=None):
    def step(state: TrainState, batch):
        grad_fn = jax.value_and_grad(
            lambda p: loss_fn(model, p, batch), has_aux=True
        )
        (loss, metrics), grads = grad_fn(state.params)
        updates, new_opt = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        # norm over TRAINABLE grads only, selected statically: reading the
        # frozen towers' grads here would be their only consumer
        # (set_to_zero never reads values), forcing XLA to keep the whole
        # frozen backward alive — and the reference's reported norm never
        # includes requires_grad=False params either
        if trainable_mask is None:
            gn = optax.global_norm(grads)
        else:
            sel = [
                g
                for g, m in zip(
                    jax.tree.leaves(grads), jax.tree.leaves(trainable_mask)
                )
                if m
            ]
            gn = optax.global_norm(sel)
        metrics["grad_norm"] = gn
        return TrainState(state.step + 1, new_params, new_opt), metrics

    return step


def make_train_step(
    model: UFVideoModel,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    loss_fn=language_model_loss_fn,
    batch_spec: Optional[P] = None,
    trainable_mask=None,
    rules=DEFAULT_RULES,
):
    """Build (init_fn, step_fn), both pjit'd over ``mesh``.

    Params/opt-state shardings come from the partition ``rules`` (pass
    ``parallel.partition.pipeline_rules()`` for pipeline-parallel runs so
    the stacked layer params shard over the pipe axis); the batch is
    sharded over the combined data axes (override with ``batch_spec`` —
    e.g. P('data') for sequence-parallel runs where the fsdp axis shards
    the sequence instead of the batch). Gradients are averaged across data
    shards implicitly by XLA (the loss is a global mean).
    """

    def init(rng, params):
        opt_state = optimizer.init(params)
        return TrainState(jnp.zeros((), jnp.int32), params, opt_state)

    step = _build_step(model, optimizer, loss_fn, trainable_mask)

    def shard_state(state: TrainState) -> TrainState:
        # optimizer state (AdamW mu/nu) mirrors the param tree paths, so the
        # same path-regex rules shard it — the ZeRO-equivalent layout
        sh = shardings_for(state, mesh, rules)
        if jax.process_count() > 1:
            # process-local device arrays can't be device_put onto a
            # cross-process sharding directly; go through host buffers
            # (every process holds the same full state — same init seed /
            # same restored checkpoint — so each contributes its shards)
            import numpy as np

            state = jax.tree.map(np.asarray, state)
        return jax.tree.map(jax.device_put, state, sh)

    spec = BATCH_SPEC if batch_spec is None else batch_spec
    batch_sharding = NamedSharding(mesh, spec)
    replicated = NamedSharding(mesh, P())
    axes = spec[0] if spec else ()
    axes = (axes,) if isinstance(axes, str) else tuple(axes or ())
    dp_size = 1
    for a in axes:
        dp_size *= mesh.shape[a]
    pcount = jax.process_count()
    step_inner = jax.jit(step, donate_argnums=(0,))

    def step_jit(state, batch):
        # shard the batch over the data axes (works for any Batch-like
        # NamedTuple — Batch, SegBatch, ...); replicate anything whose
        # leading dim doesn't divide the data axes. In a multi-process
        # runtime each process passes its LOCAL batch rows (1/pcount of the
        # global batch, process-contiguous — see
        # trainer.shard_order_for_process) and the global array is
        # assembled across processes.
        def put(x):
            if pcount == 1:
                sh = (
                    batch_sharding
                    if getattr(x, "ndim", 0) >= 1 and x.shape[0] % dp_size == 0
                    else replicated
                )
                return jax.device_put(x, sh)
            import numpy as np

            arr = np.asarray(x)
            g0 = arr.shape[0] * pcount if arr.ndim >= 1 else 0
            if arr.ndim >= 1 and g0 % dp_size == 0:
                return jax.make_array_from_process_local_data(
                    batch_sharding, arr, (g0,) + arr.shape[1:]
                )
            if arr.ndim >= 1:
                # Refuse rather than "replicate": each process holds
                # DIFFERENT local rows here, so building a replicated global
                # array from them silently diverges across hosts (each host
                # would compute on its own rows while XLA assumes identical
                # replicas). Single-process semantics (replicate the full
                # batch leaf) cannot be reproduced without an all-gather;
                # a leading dim that doesn't tile the data axes in a
                # multi-process run is a misconfigured global batch size.
                raise ValueError(
                    f"multi-process batch leaf with shape {arr.shape}: "
                    f"global leading dim {g0} (= {arr.shape[0]} local rows x "
                    f"{pcount} processes) does not divide the data-parallel "
                    f"size {dp_size}; adjust the per-process batch so every "
                    "batch-leading leaf tiles the data mesh axes"
                )
            return jax.make_array_from_process_local_data(
                replicated, arr, arr.shape
            )

        batch = jax.tree.map(put, batch)
        return step_inner(state, batch)

    return init, step_jit, shard_state


def abstract_train_state(
    model: UFVideoModel, optimizer: optax.GradientTransformation
) -> TrainState:
    """TrainState of ``jax.ShapeDtypeStruct``s at the model's real dims —
    nothing is allocated, so this works at 7B scale on any host."""
    param_shapes = jax.eval_shape(
        lambda: model.init_params(jax.random.PRNGKey(0))
    )
    opt_shapes = jax.eval_shape(optimizer.init, param_shapes)
    return TrainState(
        jax.ShapeDtypeStruct((), jnp.int32), param_shapes, opt_shapes
    )


def lower_train_step(
    model: UFVideoModel,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    batch: Batch,
    loss_fn=language_model_loss_fn,
    batch_spec: Optional[P] = None,
):
    """Lower — trace + SPMD-annotate, without compiling or executing — the
    full train step at the model's REAL dims over ``mesh``.

    ``batch`` may be real arrays or ``jax.ShapeDtypeStruct``s. This is the
    flagship-scale sharding validation: a partition rule that does not
    divide the real dims, or a layout the SPMD partitioner rejects, fails
    here without needing the chips (or the memory) to run it. Returns
    (lowered, state_shardings)."""
    state_shapes = abstract_train_state(model, optimizer)
    state_sh = shardings_for(state_shapes, mesh, DEFAULT_RULES)
    state_abs = jax.tree.map(
        lambda l, s: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=s),
        state_shapes, state_sh,
    )

    spec = BATCH_SPEC if batch_spec is None else batch_spec
    axes = spec[0] if spec else ()
    axes = (axes,) if isinstance(axes, str) else tuple(axes or ())
    dp_size = 1
    for a in axes:
        dp_size *= mesh.shape[a]
    batch_sharding = NamedSharding(mesh, spec)
    replicated = NamedSharding(mesh, P())

    def abstract(x):
        sh = (
            batch_sharding
            if getattr(x, "ndim", 0) >= 1 and x.shape[0] % dp_size == 0
            else replicated
        )
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh)

    batch_abs = jax.tree.map(abstract, batch)
    step = _build_step(model, optimizer, loss_fn)  # lowering check: no mask
    lowered = jax.jit(step, donate_argnums=(0,)).lower(state_abs, batch_abs)
    return lowered, state_sh
