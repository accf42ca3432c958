"""SAM2 video propagation as a single `lax.scan`.

TPU-native redesign of the reference's stateful generator pipeline
(reference: sam2.py:3526-4153 SAM2VideoPredictor — init_state dicts,
per-frame python loop, dict-of-frames output_dict). For the UFVideo usage
pattern — one conditioning frame (frame 0, prompted by [SEG] language
embeddings, sam2.py:3845-3919 add_language_embd) then forward propagation
(:4071-4153) — the memory selection logic (:2834-3003) collapses to:

  - maskmem bank = cond frame 0 + ring buffer of the last 6 frames
  - object pointers = cond frame 0 + ring buffer of the last 15 frames
    (past-only, no temporal pos enc)

so the carry is a fixed-shape NamedTuple and the whole video is one scan.
Frame features are batch-encoded up front (vs. the reference's per-frame
cache, :3547-3579) — far better MXU utilization.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ...configs import SAM2Config
from .model import SAM2


class VideoState(NamedTuple):
    """Scan carry. B = number of tracked objects."""

    cond_mem: jnp.ndarray  # [B, HW, mem_dim] frame-0 memory
    cond_ptr: jnp.ndarray  # [B, C] frame-0 object pointer
    mem_bank: jnp.ndarray  # [6, B, HW, mem_dim] newest-first ring
    ptr_bank: jnp.ndarray  # [15, B, C] newest-first ring


class FrameFeatures(NamedTuple):
    """Per-frame image-encoder outputs, stacked over time (NHWC)."""

    s0: jnp.ndarray  # [T, 4H, 4W, C/8] (after conv_s0)
    s1: jnp.ndarray  # [T, 2H, 2W, C/4] (after conv_s1)
    s2: jnp.ndarray  # [T, H, W, C]
    pos2: jnp.ndarray  # [T, H, W, C] sine pos embed of the top level


import functools


@functools.partial(jax.jit, static_argnames=("model",))
def _forward_image_jit(model: SAM2, params, images: jnp.ndarray):
    return model.apply({"params": params}, images, method=SAM2.forward_image)


def encode_video_frames(
    model: SAM2, params, images: jnp.ndarray, chunk: int = 8
) -> FrameFeatures:
    """Batch-encode all T frames [T, 1024, 1024, 3] through Hiera+FPN.

    Chunked over T to bound activation memory on a single chip; each chunk
    is one jitted dispatch (eager module application costs seconds on
    remote-execution runtimes).
    """
    t = images.shape[0]
    outs = []
    for start in range(0, t, chunk):
        sl = images[start : start + chunk]
        if sl.shape[0] != chunk:
            pad = chunk - sl.shape[0]
            sl = jnp.pad(sl, ((0, pad), (0, 0), (0, 0), (0, 0)))
            out = _forward_image_jit(model, params, sl)
            out = jax.tree.map(lambda x: x[: chunk - pad], out)
        else:
            out = _forward_image_jit(model, params, sl)
        outs.append(out)
    feats = [
        jnp.concatenate([o["backbone_fpn"][i] for o in outs], axis=0)
        for i in range(3)
    ]
    pos2 = jnp.concatenate([o["vision_pos_enc"][2] for o in outs], axis=0)
    return FrameFeatures(feats[0], feats[1], feats[2], pos2)


def _broadcast_obj(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """Share one frame's features across the object batch — or pass through
    per-object features that already carry the batch dim (batched
    multi-video propagation, where the video dim rides the object dim)."""
    if x.ndim == 4:
        assert x.shape[0] == b, (x.shape, b)
        return x
    return jnp.broadcast_to(x[None], (b,) + x.shape)


def init_on_first_frame(
    model: SAM2,
    params,
    feats: FrameFeatures,
    language_embd: jnp.ndarray,  # [B, 1, C] one [SEG] embedding per object
) -> Tuple[VideoState, jnp.ndarray]:
    """Condition frame 0 on the language embeddings and build the initial
    memory state (reference add_language_embd + preflight consolidation,
    sam2.py:3845-3919, 3700-3770).

    Returns (state, frame-0 low-res mask logits [B, 1, h4, w4]).
    """
    cfg: SAM2Config = model.cfg
    b = language_embd.shape[0]
    h = w = cfg.sam_image_embedding_size
    hw = h * w
    c = cfg.sam_embed_dim

    s2 = _broadcast_obj(feats.s2[0], b)  # [B, H, W, C]
    curr = s2.reshape(b, hw, c)
    pix = model.apply(
        {"params": params}, curr, method=SAM2.no_memory_features
    ).reshape(b, h, w, c)

    high_res = [
        _broadcast_obj(feats.s0[0], b),
        _broadcast_obj(feats.s1[0], b),
    ]
    out = model.apply(
        {"params": params}, pix, high_res, language_embd,
        method=SAM2.forward_sam_heads,
    )

    # consolidated memory: low-res best masks upsampled to image res →
    # memory encoder (sam2.py:3747-3767)
    hr = jax.image.resize(
        out.low_res_masks.astype(jnp.float32),
        (b, 1, cfg.hiera.image_size, cfg.hiera.image_size),
        method="bilinear",
    )
    cond_mem = model.apply(
        {"params": params}, s2, hr.transpose(0, 2, 3, 1),
        method=SAM2.encode_memory,
    ).reshape(b, hw, cfg.mem_dim)

    state = VideoState(
        cond_mem=cond_mem,
        cond_ptr=out.obj_ptr,
        mem_bank=jnp.zeros((cfg.num_maskmem - 1, b, hw, cfg.mem_dim), cond_mem.dtype),
        ptr_bank=jnp.zeros(
            (cfg.max_obj_ptrs_in_encoder - 1, b, c), out.obj_ptr.dtype
        ),
    )
    return state, out.low_res_masks


def track_frame(
    model: SAM2,
    params,
    state: VideoState,
    frame_idx: jnp.ndarray,  # scalar int32 (>= 1)
    s0: jnp.ndarray,  # this frame's features
    s1: jnp.ndarray,
    s2: jnp.ndarray,
    pos2: jnp.ndarray,
    num_frames: int,
) -> Tuple[VideoState, jnp.ndarray]:
    """One propagation step (reference track_step, sam2.py:3174-3273)."""
    cfg: SAM2Config = model.cfg
    n_mem = cfg.num_maskmem - 1
    n_ptr = cfg.max_obj_ptrs_in_encoder - 1
    b = state.cond_mem.shape[0]
    h = w = cfg.sam_image_embedding_size
    hw = h * w
    c = cfg.sam_embed_dim

    curr = _broadcast_obj(s2, b).reshape(b, hw, c)
    curr_pos = _broadcast_obj(pos2, b).reshape(b, hw, c)

    # memory slots: [cond, newest..oldest]; bank slot j holds frame fi-1-j
    mem_feats = jnp.concatenate(
        [state.cond_mem[:, None], state.mem_bank.transpose(1, 0, 2, 3)], axis=1
    )  # [B, 7, HW, mem]
    slot_j = jnp.arange(n_mem)
    bank_valid = slot_j <= frame_idx - 2
    mem_valid = jnp.concatenate(
        [jnp.ones((1,), bool), bank_valid]
    )[None].repeat(b, axis=0)
    # tpos index: cond → num_maskmem-1; bank slot j (t_rel j+1) → j
    # (sam2.py:2916-2919 maskmem_tpos_enc[num_maskmem - t_pos - 1])
    mem_tpos_idx = jnp.concatenate(
        [jnp.array([cfg.num_maskmem - 1]), slot_j]
    )

    max_ptrs = min(num_frames, cfg.max_obj_ptrs_in_encoder)
    ptrs = jnp.concatenate(
        [state.cond_ptr[:, None], state.ptr_bank.transpose(1, 0, 2)], axis=1
    )  # [B, 16, C]
    pj = jnp.arange(n_ptr)
    ptr_bank_valid = (pj <= frame_idx - 2) & (pj < max_ptrs - 1)
    ptr_valid = jnp.concatenate(
        [jnp.ones((1,), bool), ptr_bank_valid]
    )[None].repeat(b, axis=0)

    pix = model.apply(
        {"params": params},
        curr, curr_pos, mem_feats, mem_valid, mem_tpos_idx, ptrs, ptr_valid,
        (h, w),
        method=SAM2.condition_on_memory,
    ).reshape(b, h, w, c)

    high_res = [_broadcast_obj(s0, b), _broadcast_obj(s1, b)]
    out = model.apply(
        {"params": params}, pix, high_res, None,
        method=SAM2.forward_sam_heads,
    )

    new_mem = model.apply(
        {"params": params},
        _broadcast_obj(s2, b),
        out.high_res_masks.transpose(0, 2, 3, 1),
        method=SAM2.encode_memory,
    ).reshape(b, hw, cfg.mem_dim)

    state = VideoState(
        cond_mem=state.cond_mem,
        cond_ptr=state.cond_ptr,
        mem_bank=jnp.concatenate(
            [new_mem[None], state.mem_bank[:-1]], axis=0
        ),
        ptr_bank=jnp.concatenate(
            [out.obj_ptr[None].astype(state.ptr_bank.dtype), state.ptr_bank[:-1]],
            axis=0,
        ),
    )
    return state, out.low_res_masks


@functools.partial(jax.jit, static_argnames=("model",))
def propagate_video(
    model: SAM2,
    params,
    feats: FrameFeatures,
    language_embd: jnp.ndarray,  # [B, 1, C]
) -> jnp.ndarray:
    """Full propagation: frame 0 conditioning + scan over frames 1..T-1.

    Returns low-res mask logits [T, B, 1, h4, w4] (reference
    language_embd_inference + propagate_in_video, sam2.py:378-404,
    4071-4153). Upsample + sigmoid > 0.5 happens at the caller, matching
    videorefer_qwen2.py:447-452.
    """
    t = feats.s2.shape[0]
    state, mask0 = init_on_first_frame(model, params, feats, language_embd)

    def step(carry, xs):
        fi, s0, s1, s2, pos2 = xs
        new_state, masks = track_frame(
            model, params, carry, fi, s0, s1, s2, pos2, num_frames=t
        )
        return new_state, masks

    xs = (
        jnp.arange(1, t, dtype=jnp.int32),
        feats.s0[1:], feats.s1[1:], feats.s2[1:], feats.pos2[1:],
    )
    _, masks_rest = jax.lax.scan(step, state, xs)
    return jnp.concatenate([mask0[None], masks_rest], axis=0)


@functools.partial(jax.jit, static_argnames=("model",))
def propagate_videos_batched(
    model: SAM2,
    params,
    feats: FrameFeatures,  # arrays laid out [V, T, ...]
    language_embd: jnp.ndarray,  # [V, 1, C] — one object per video
) -> jnp.ndarray:
    """Propagate V independent videos in one scan.

    The video dim rides the memory machinery's object-batch dim: one scan
    and one dispatch instead of V, with the per-frame ops (memory
    attention, SAM heads, memory encoder) seeing a V-row batch. Single-video
    propagation is already cheap (~82 ms for 8 frames on a v5e), so the
    end-to-end gain is modest — the point is serving latency that stays
    flat in V. For multiple objects per video, repeat each video's features
    per object and flatten (V*B, ...). Returns low-res mask logits
    [T, V, 1, h4, w4].
    """
    f = FrameFeatures(
        jnp.moveaxis(feats.s0, 0, 1),
        jnp.moveaxis(feats.s1, 0, 1),
        jnp.moveaxis(feats.s2, 0, 1),
        jnp.moveaxis(feats.pos2, 0, 1),
    )
    return propagate_video(model, params, f, language_embd)


def sam_train_masks(
    model: SAM2,
    params,
    s0: jnp.ndarray,  # [N, 4H, 4W, C/8] per-row frame features
    s1: jnp.ndarray,  # [N, 2H, 2W, C/4]
    s2: jnp.ndarray,  # [N, H, W, C]
    language_embd: jnp.ndarray,  # [N, 1, C]
) -> jnp.ndarray:
    """Training decode path: no memory, language-prompted SAM heads on a flat
    (sample × frame × object) batch → high-res mask logits [N, 1, 16H, 16W]
    (reference inject_language_embd_train, sam2.py:343-375)."""
    cfg: SAM2Config = model.cfg
    n = s2.shape[0]
    h = w = cfg.sam_image_embedding_size
    c = cfg.sam_embed_dim
    pix = model.apply(
        {"params": params}, s2.reshape(n, h * w, c),
        method=SAM2.no_memory_features,
    ).reshape(n, h, w, c)
    out = model.apply(
        {"params": params}, pix, [s0, s1], language_embd,
        method=SAM2.forward_sam_heads,
    )
    return out.high_res_masks


def masks_to_video_res(masks: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """[T, B, 1, h, w] logits → [T, B, height, width] bool masks (bilinear +
    sigmoid > 0.5, videorefer_qwen2.py:447-452)."""
    t, b = masks.shape[:2]
    up = jax.image.resize(
        masks.astype(jnp.float32), (t, b, 1, height, width), method="bilinear"
    )
    return up[:, :, 0] > 0.0  # sigmoid(x) > 0.5 ⇔ x > 0
