"""Training losses.

Reference formulas: weighted CE (videorefer_qwen2.py:213-214 with
ce_loss_weight), scaled dice loss (:34-57, scale=1000), sigmoid CE per-mask
mean (:60-77); aggregation over the batch with per-sample num_masks weighting
(:308-338) using bce=2.0 / dice=0.5 (train.py:126-128).

All reductions run in float32; masks carry validity so padded objects/frames
contribute exactly zero.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..constants import IGNORE_INDEX


def causal_lm_loss(
    logits: jnp.ndarray,  # [B, S, V] (possibly padded vocab)
    labels: jnp.ndarray,  # [B, S] int32 with IGNORE_INDEX
    vocab_size: Optional[int] = None,
) -> jnp.ndarray:
    """Next-token CE with HF-style internal shift: logits at position t score
    labels at t+1. Mean over non-ignored targets."""
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    if vocab_size is not None and vocab_size < logits.shape[-1]:
        neg = jnp.finfo(jnp.float32).min
        mask = jnp.arange(logits.shape[-1]) < vocab_size
        logits = jnp.where(mask, logits, neg)
    valid = targets != IGNORE_INDEX
    safe_targets = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / denom


def dice_loss(
    inputs: jnp.ndarray,  # [N, H, W] mask logits
    targets: jnp.ndarray,  # [N, H, W] binary
    num_masks: jnp.ndarray | float,
    scale: float = 1000.0,
    eps: float = 1e-6,
    valid: Optional[jnp.ndarray] = None,  # [N] bool
) -> jnp.ndarray:
    probs = jax.nn.sigmoid(inputs.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    probs = probs.reshape(probs.shape[0], -1)
    t = t.reshape(t.shape[0], -1)
    numerator = 2.0 * jnp.sum(probs / scale * t, axis=-1)
    denominator = jnp.sum(probs / scale, axis=-1) + jnp.sum(t / scale, axis=-1)
    loss = 1.0 - (numerator + eps) / (denominator + eps)
    if valid is not None:
        loss = jnp.where(valid, loss, 0.0)
    return jnp.sum(loss) / (num_masks + 1e-8)


def sigmoid_ce_loss(
    inputs: jnp.ndarray,  # [N, H, W] mask logits
    targets: jnp.ndarray,  # [N, H, W] binary
    num_masks: jnp.ndarray | float,
    valid: Optional[jnp.ndarray] = None,  # [N] bool
) -> jnp.ndarray:
    x = inputs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    # numerically-stable BCE with logits
    per_el = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    per_mask = jnp.mean(per_el.reshape(per_el.shape[0], -1), axis=-1)
    if valid is not None:
        per_mask = jnp.where(valid, per_mask, 0.0)
    return jnp.sum(per_mask) / (num_masks + 1e-8)


def combined_mask_loss(
    pred_masks: jnp.ndarray,  # [N, H, W] logits
    gt_masks: jnp.ndarray,  # [N, H, W]
    valid: jnp.ndarray,  # [N] bool
    bce_weight: float = 2.0,
    dice_weight: float = 0.5,
):
    """Reference aggregation (videorefer_qwen2.py:308-338) collapsed to a
    flat masked batch: per-sample scaling by gt count and the final
    num_masks normalization cancel into a single masked mean."""
    num = jnp.sum(valid.astype(jnp.float32))
    bce = sigmoid_ce_loss(pred_masks, gt_masks, num, valid=valid)
    dce = dice_loss(pred_masks, gt_masks, num, valid=valid)
    return bce_weight * bce, dice_weight * dce
