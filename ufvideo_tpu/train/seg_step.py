"""Full multimodal + segmentation training loss.

Reproduces the composite loss of the reference forward (reference:
videorefer_qwen2.py:129-352): weighted CE over the spliced sequence, plus
sigmoid-CE + dice on SAM2 masks decoded from [SEG]-token hidden states.
All object/frame slots are static with validity masks; the reference's
per-sample Python loops (:242-338) collapse into flat masked batches.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configs import UFVideoConfig
from ..models.qwen2 import Qwen2LM
from ..models.sam2 import SAM2
from ..models.sam2.video import sam_train_masks
from ..models.ufvideo import UFVideoModel
from .losses import causal_lm_loss, combined_mask_loss


class SegBatch(NamedTuple):
    """Collator output for seg-enabled training (static shapes)."""

    pixels: jnp.ndarray  # [B, T, H, W, 3]
    text_ids: jnp.ndarray
    src_kind: jnp.ndarray
    src_idx: jnp.ndarray
    seq_lens: jnp.ndarray
    labels: jnp.ndarray  # [B, S]
    images_sam: jnp.ndarray  # [B, Ts, 1024, 1024, 3]
    gt_masks: jnp.ndarray  # [B, n_obj, Ts, Hg, Wg]
    obj_valid: jnp.ndarray  # [B, n_obj] bool
    region_frames: Optional[jnp.ndarray] = None
    region_masks: Optional[jnp.ndarray] = None
    region_frame_valid: Optional[jnp.ndarray] = None
    region_segments: Optional[jnp.ndarray] = None


def select_seg_hidden(
    hidden: jnp.ndarray,  # [B, S, D]
    labels: jnp.ndarray,  # [B, S]
    seg_token_id: int,
    max_objects: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hidden states at positions whose NEXT label is [SEG] (the left-shifted
    seg mask, videorefer_qwen2.py:218-231), padded to max_objects per sample.
    Returns ([B, n_obj, D], [B, n_obj] validity)."""
    b, s, d = hidden.shape
    seg_mask = jnp.concatenate(
        [labels[:, 1:] == seg_token_id, jnp.zeros((b, 1), bool)], axis=1
    )
    # stable order: first seg positions first
    order = jnp.argsort(~seg_mask, axis=1, stable=True)[:, :max_objects]
    picked = jnp.take_along_axis(hidden, order[..., None], axis=1)
    valid = jnp.take_along_axis(seg_mask, order, axis=1)
    return picked, valid


def segmentation_loss_fn(
    model: UFVideoModel,
    sam: SAM2,
    params,
    batch: SegBatch,
    lora=None,
    dropout_rng=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    cfg: UFVideoConfig = model.cfg
    b = batch.pixels.shape[0]
    n_obj = batch.obj_valid.shape[1]
    ts = batch.images_sam.shape[1]

    # ---- language side ----
    video_feats = model.encode_video(params, batch.pixels)
    region_feats = None
    if batch.region_frames is not None:
        region_feats, _ = model.encode_regions(
            params, batch.region_frames, batch.region_masks,
            batch.region_frame_valid, batch.region_segments,
        )
    embeds = model.splice_embeds(
        params, batch.text_ids, batch.src_kind, batch.src_idx,
        video_feats, region_feats,
    )
    s = embeds.shape[1]
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

    # ---- [SEG] → SAM2 decode ----
    seg_hidden, seg_valid = select_seg_hidden(
        hidden, batch.labels, cfg.seg_token_id, n_obj
    )
    seg_embed = model.seg_embeddings(params, seg_hidden)  # [B, n_obj, 256]

    # SAM image encode: flat (B*Ts) frames (reference batches b·t the same
    # way, sam2.py:412-447)
    ss = cfg.sam.hiera.image_size
    flat = batch.images_sam.reshape(b * ts, ss, ss, 3)
    enc = sam.apply({"params": params["sam"]}, flat, method=SAM2.forward_image)
    s0, s1, s2 = enc["backbone_fpn"]

    def tile_objs(x):
        # [B*Ts, ...] → [B, 1, Ts, ...] → [B, n_obj, Ts, ...] → flat rows
        x = x.reshape((b, 1, ts) + x.shape[1:])
        x = jnp.broadcast_to(x, (b, n_obj, ts) + x.shape[3:])
        return x.reshape((b * n_obj * ts,) + x.shape[3:])

    lang_rows = jnp.repeat(
        seg_embed.reshape(b * n_obj, 1, -1), ts, axis=0
    )  # [(B*n_obj*Ts), 1, 256]
    high_res = sam_train_masks(
        sam, params["sam"], tile_objs(s0), tile_objs(s1), tile_objs(s2),
        lang_rows,
    )  # [(B*n_obj*Ts), 1, 1024, 1024]

    gh, gw = batch.gt_masks.shape[-2:]
    pred = jax.image.resize(
        high_res.astype(jnp.float32),
        (b * n_obj * ts, 1, gh, gw),
        method="bilinear",
    )[:, 0]
    gt = batch.gt_masks.reshape(b * n_obj * ts, gh, gw)
    mask_valid = jnp.repeat(
        (batch.obj_valid & seg_valid).reshape(-1), ts
    )

    bce, dice = combined_mask_loss(
        pred, gt, mask_valid,
        bce_weight=cfg.bce_loss_weight, dice_weight=cfg.dice_loss_weight,
    )
    mask_loss = bce + dice
    loss = cfg.ce_loss_weight * ce + mask_loss
    return loss, {
        "loss": loss,
        "ce_loss": ce,
        "mask_bce_loss": bce,
        "mask_dice_loss": dice,
        "mask_loss": mask_loss,
    }


def make_seg_loss_fn(sam: SAM2):
    """Adapter matching make_train_step's loss_fn signature."""

    def fn(model: UFVideoModel, params, batch: SegBatch, **kw):
        return segmentation_loss_fn(model, sam, params, batch, **kw)

    return fn
