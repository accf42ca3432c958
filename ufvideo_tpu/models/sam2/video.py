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
    # sine pos embed of the top level — identical for every frame (and every
    # video), so it is stored ONCE as [H, W, C] rather than [T, H, W, C]:
    # at 16-video serving batches the per-frame f32 copy alone was ~0.5 GB
    pos2: jnp.ndarray  # [H, W, C]

    def map_frames(self, fn) -> "FrameFeatures":
        """Apply ``fn`` to the per-frame feature arrays (s0/s1/s2) only —
        pos2 is frame-invariant and passes through unchanged. Use this
        instead of ``jax.tree.map`` for slicing/reshaping the T axis."""
        return FrameFeatures(
            fn(self.s0), fn(self.s1), fn(self.s2), self.pos2
        )


import functools


@functools.partial(jax.jit, static_argnames=("model",))
def _encode_frames_jit(model: SAM2, params, images: jnp.ndarray):
    """forward_image trimmed to what FrameFeatures keeps: the three FPN
    levels and ONE copy of the top-level sine pos embed. Returning only
    these lets XLA dead-code the broadcast level-0/1 pos embeds — which are
    never used downstream but would otherwise ride out of every chunk's
    dispatch as [T, 256, 256, 256] live buffers (~2.7 GB across a 64-frame
    serving batch; the batch-8 e2e OOM'd exactly here)."""
    out = model.apply({"params": params}, images, method=SAM2.forward_image)
    fpn = out["backbone_fpn"]
    return fpn[0], fpn[1], fpn[2], out["vision_pos_enc"][2][0]


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
    pos2 = None
    for start in range(0, t, chunk):
        sl = images[start : start + chunk]
        if sl.shape[0] != chunk:
            pad = chunk - sl.shape[0]
            sl = jnp.pad(sl, ((0, pad), (0, 0), (0, 0), (0, 0)))
            s0, s1, s2, pos2 = _encode_frames_jit(model, params, sl)
            keep = chunk - pad
            outs.append((s0[:keep], s1[:keep], s2[:keep]))
        else:
            s0, s1, s2, pos2 = _encode_frames_jit(model, params, sl)
            outs.append((s0, s1, s2))
    feats = [
        jnp.concatenate([o[i] for o in outs], axis=0) for i in range(3)
    ]
    return FrameFeatures(feats[0], feats[1], feats[2], pos2)


def _broadcast_obj(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """Share one frame's features across the object batch — or pass through
    per-object features that already carry the batch dim (batched
    multi-video propagation, where the video dim rides the object dim)."""
    if x.ndim == 4:
        assert x.shape[0] == b, (x.shape, b)
        return x
    return jnp.broadcast_to(x[None], (b,) + x.shape)


def _ring_len(cfg: SAM2Config, stride: int) -> int:
    """Memory-ring length covering the strided selection's oldest reach
    (reference temporal stride r, sam2.py:2874-2898): with stride r the
    t_rel=num_maskmem-1 memory can sit up to (num_maskmem-2)·r frames back."""
    return (cfg.num_maskmem - 2) * max(stride, 1) + 1


def _condition_frame(
    model: SAM2,
    params,
    feats: FrameFeatures,
    frame_idx: int,
    language_embd: jnp.ndarray = None,  # [B, 1, C]
    point_coords: jnp.ndarray = None,  # [B, P, 2] abs pixels (model space)
    point_labels: jnp.ndarray = None,  # [B, P]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Condition one frame (no memory) on language embeddings OR point/box
    prompts: reference add_language_embd / add_new_points with
    is_init_cond_frame=True (sam2.py:3845-3919) + the preflight memory
    consolidation (:3700-3770).

    Returns (memory [B, HW, mem], obj_ptr [B, C], low_res logits [B,1,h4,w4]).
    """
    cfg: SAM2Config = model.cfg
    b = (
        language_embd.shape[0]
        if language_embd is not None else point_coords.shape[0]
    )
    h = w = cfg.sam_image_embedding_size
    hw = h * w
    c = cfg.sam_embed_dim

    s2 = _broadcast_obj(feats.s2[frame_idx], b)  # [B, H, W, C]
    curr = s2.reshape(b, hw, c)
    pix = model.apply(
        {"params": params}, curr, method=SAM2.no_memory_features
    ).reshape(b, h, w, c)

    high_res = [
        _broadcast_obj(feats.s0[frame_idx], b),
        _broadcast_obj(feats.s1[frame_idx], b),
    ]
    # _use_multimask (sam2.py:3475-3484): multimask only for 0..1 points
    # (multimask_min/max_pt_num are baked to 0/1 in the UFVideo build, so a
    # box — two corner points — selects the single-mask head).
    n_pts = 0 if point_labels is None else point_labels.shape[1]
    out = model.apply(
        {"params": params}, pix, high_res, language_embd,
        point_coords, point_labels, None, 0 <= n_pts <= 1,
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
    return cond_mem, out.obj_ptr, out.low_res_masks


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
    hw = cfg.sam_image_embedding_size ** 2
    cond_mem, cond_ptr, low_res = _condition_frame(
        model, params, feats, 0, language_embd
    )
    state = VideoState(
        cond_mem=cond_mem,
        cond_ptr=cond_ptr,
        mem_bank=jnp.zeros(
            (cfg.num_maskmem - 1, b, hw, cfg.mem_dim), cond_mem.dtype
        ),
        ptr_bank=jnp.zeros(
            (cfg.max_obj_ptrs_in_encoder - 1, b, cfg.sam_embed_dim),
            cond_ptr.dtype,
        ),
    )
    return state, low_res


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


# ----------------------------------------------------------------------
# General video predictor: temporal stride, reverse / mid-video tracking,
# multi-frame point/box/language conditioning (reference SAM2VideoPredictor
# features beyond the UFVideo usage pattern, sam2.py:2874-2898 strided
# memory selection, :4071-4153 propagate_in_video(reverse/start_frame_idx),
# :3585-3650 add_new_points). The maskmem CPU offload (:3624-3629) is
# deliberately absent: the scan carry is a fixed ring of
# (num_maskmem-2)·r+1 memories, O(1) in video length, so there is nothing
# growing to offload.
# ----------------------------------------------------------------------


class FrameCondition(NamedTuple):
    """One prompted frame. Exactly one of language_embd / points / box per
    frame (points and box may combine: the box contributes two corner points
    with labels 2/3, the prompt-encoder convention the reference's
    _embed_points supports at sam2.py:1640-1650)."""

    frame_idx: int
    language_embd: jnp.ndarray = None  # [B, 1, C]
    point_coords: jnp.ndarray = None  # [B, P, 2] abs pixels (model space)
    point_labels: jnp.ndarray = None  # [B, P] in {0,1}
    box: jnp.ndarray = None  # [B, 4] xyxy abs pixels (model space)


class GeneralVideoState(NamedTuple):
    """Scan carry for the general predictor. N = number of cond frames."""

    cond_mem: jnp.ndarray  # [N, B, HW, mem_dim]
    cond_ptr: jnp.ndarray  # [N, B, C]
    mem_bank: jnp.ndarray  # [L, B, HW, mem_dim] newest-first ring
    ptr_bank: jnp.ndarray  # [P, B, C] newest-first ring


def _select_mem_slots(
    cfg: SAM2Config,
    frame_idx: jnp.ndarray,  # traced scalar
    anchor_idx: int,
    cond_idcs: Tuple[int, ...],
    stride: int,
    reverse: bool,
):
    """Strided non-cond memory selection (sam2.py:2874-2898) mapped onto the
    consecutive ring: slot j holds the frame tracked j+1 steps ago, i.e.
    frame_idx∓(1+j). Returns (slot [num_maskmem-1], valid, tpos_idx)."""
    r = max(stride, 1)
    t_rel = jnp.arange(1, cfg.num_maskmem, dtype=jnp.int32)
    if reverse:
        near = -((-(frame_idx + 2)) // r) * r  # ceil to the next r-multiple
        p = jnp.where(t_rel == 1, frame_idx + 1, near + (t_rel - 2) * r)
        slot = p - frame_idx - 1
        valid = (p >= frame_idx + 1) & (p <= anchor_idx - 1)
    else:
        near = ((frame_idx - 2) // r) * r  # floor to the prev r-multiple
        p = jnp.where(t_rel == 1, frame_idx - 1, near - (t_rel - 2) * r)
        slot = frame_idx - 1 - p
        valid = (p <= frame_idx - 1) & (p >= anchor_idx + 1)
    for ci in cond_idcs:
        # cond frames live in cond_frame_outputs, not the non-cond dict, and
        # with max_cond_frames_in_attn unlimited there are no "unselected"
        # cond frames to fall back to (sam2.py:2899-2906) → masked out here
        valid = valid & (p != ci)
    ring = _ring_len(cfg, r)
    valid = valid & (slot >= 0) & (slot < ring)
    # tpos: selected t_rel → maskmem_tpos_enc[t_rel - 1] (sam2.py:2916-2919)
    return jnp.clip(slot, 0, ring - 1), valid, t_rel - 1


def _track_frame_general(
    model: SAM2,
    params,
    state: GeneralVideoState,
    frame_idx: jnp.ndarray,  # traced scalar int32
    s0: jnp.ndarray,
    s1: jnp.ndarray,
    s2: jnp.ndarray,
    pos2: jnp.ndarray,
    *,
    num_frames: int,
    anchor_idx: int,
    cond_idcs: Tuple[int, ...],
    stride: int,
    reverse: bool,
) -> Tuple[GeneralVideoState, jnp.ndarray]:
    """One general propagation step (reference track_step, sam2.py:3174-3273,
    with the full strided/reverse memory selection)."""
    cfg: SAM2Config = model.cfg
    n_cond = state.cond_mem.shape[0]
    b = state.cond_mem.shape[1]
    n_ptr = cfg.max_obj_ptrs_in_encoder - 1
    h = w = cfg.sam_image_embedding_size
    hw = h * w
    c = cfg.sam_embed_dim

    curr = _broadcast_obj(s2, b).reshape(b, hw, c)
    curr_pos = _broadcast_obj(pos2, b).reshape(b, hw, c)

    slot, sel_valid, sel_tpos = _select_mem_slots(
        cfg, frame_idx, anchor_idx, cond_idcs, stride, reverse
    )
    sel = jnp.take(state.mem_bank, slot, axis=0)  # [num_maskmem-1, B, HW, md]
    mem_feats = jnp.concatenate(
        [state.cond_mem, sel], axis=0
    ).transpose(1, 0, 2, 3)  # [B, N+num_maskmem-1, HW, md]
    mem_valid = jnp.concatenate(
        [jnp.ones((n_cond,), bool), sel_valid]
    )[None].repeat(b, axis=0)
    # all cond frames use t_pos=0 → tpos index num_maskmem-1 (sam2.py:2868)
    mem_tpos_idx = jnp.concatenate(
        [jnp.full((n_cond,), cfg.num_maskmem - 1, jnp.int32), sel_tpos]
    )

    # object pointers: cond ptrs (past-only for eval, sam2.py:2930-2938) +
    # the consecutive t_diff=1.. ring walk (:2940-2949)
    cond_ts = jnp.asarray(cond_idcs, jnp.int32)
    cond_ptr_valid = (
        cond_ts >= frame_idx if reverse else cond_ts <= frame_idx
    )
    max_ptrs = min(num_frames, cfg.max_obj_ptrs_in_encoder)
    pj = jnp.arange(n_ptr)
    p_frame = frame_idx + (1 + pj) if reverse else frame_idx - (1 + pj)
    if reverse:
        ring_valid = (p_frame <= anchor_idx - 1) & (p_frame >= frame_idx + 1)
    else:
        ring_valid = (p_frame >= anchor_idx + 1) & (p_frame <= frame_idx - 1)
    for ci in cond_idcs:
        ring_valid = ring_valid & (p_frame != ci)
    ring_valid = ring_valid & (pj < max_ptrs - 1)
    ptrs = jnp.concatenate(
        [state.cond_ptr, state.ptr_bank], axis=0
    ).transpose(1, 0, 2)  # [B, N+n_ptr, C]
    ptr_valid = jnp.concatenate(
        [cond_ptr_valid, ring_valid]
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

    state = GeneralVideoState(
        cond_mem=state.cond_mem,
        cond_ptr=state.cond_ptr,
        mem_bank=jnp.concatenate([new_mem[None], state.mem_bank[:-1]], axis=0),
        ptr_bank=jnp.concatenate(
            [out.obj_ptr[None].astype(state.ptr_bank.dtype),
             state.ptr_bank[:-1]],
            axis=0,
        ),
    )
    return state, out.low_res_masks


@functools.partial(
    jax.jit, static_argnames=("model", "cond_idcs", "stride", "direction")
)
def _propagate_general_jit(
    model: SAM2,
    params,
    feats: FrameFeatures,
    cond_inputs,  # tuple of (language_embd|None, coords|None, labels|None)
    cond_idcs: Tuple[int, ...],
    stride: int,
    direction: str,
) -> jnp.ndarray:
    from .common import NO_OBJ_SCORE

    cfg: SAM2Config = model.cfg
    t = feats.s2.shape[0]
    hw = cfg.sam_image_embedding_size ** 2

    cond_mems, cond_ptrs, cond_masks = [], [], []
    for ci, (lang, coords, labels) in zip(cond_idcs, cond_inputs):
        m, ptr, low = _condition_frame(
            model, params, feats, ci, lang, coords, labels
        )
        cond_mems.append(m)
        cond_ptrs.append(ptr)
        cond_masks.append(low)
    b = cond_mems[0].shape[0]

    anchor = min(cond_idcs)
    state0 = GeneralVideoState(
        cond_mem=jnp.stack(cond_mems),
        cond_ptr=jnp.stack(cond_ptrs),
        mem_bank=jnp.zeros(
            (_ring_len(cfg, stride), b, hw, cfg.mem_dim), cond_mems[0].dtype
        ),
        ptr_bank=jnp.zeros(
            (cfg.max_obj_ptrs_in_encoder - 1, b, cfg.sam_embed_dim),
            cond_ptrs[0].dtype,
        ),
    )

    h4 = cfg.sam_image_embedding_size * 4
    masks = jnp.full((t, b, 1, h4, h4), NO_OBJ_SCORE, jnp.float32)

    def run(frames, reverse):
        def step(carry, xs):
            fi, s0, s1, s2 = xs
            return _track_frame_general(
                model, params, carry, fi, s0, s1, s2, feats.pos2,
                num_frames=t, anchor_idx=anchor, cond_idcs=cond_idcs,
                stride=stride, reverse=reverse,
            )

        idx = jnp.asarray(frames, jnp.int32)
        xs = (idx, feats.s0[idx], feats.s1[idx], feats.s2[idx])
        _, out = jax.lax.scan(step, state0, xs)
        return out

    if direction in ("forward", "both") and anchor < t - 1:
        fwd = list(range(anchor + 1, t))
        masks = masks.at[jnp.asarray(fwd)].set(run(fwd, reverse=False))
    if direction in ("reverse", "both") and anchor > 0:
        rev = list(range(anchor - 1, -1, -1))
        masks = masks.at[jnp.asarray(rev)].set(run(rev, reverse=True))

    # prompted frames keep their conditioning outputs (propagate_in_video
    # yields the stored cond output for them, sam2.py:4115-4123)
    for ci, low in zip(cond_idcs, cond_masks):
        masks = masks.at[ci].set(low.astype(jnp.float32))
    return masks


def propagate_video_general(
    model: SAM2,
    params,
    feats: FrameFeatures,
    conditions,  # sequence of FrameCondition (same B across frames)
    *,
    stride: int = 1,
    direction: str = "both",
) -> jnp.ndarray:
    """General video propagation: arbitrary prompted frames (language
    embeddings, clicks, or boxes), temporal memory stride, and forward /
    reverse / bidirectional tracking.

    Mirrors the reference SAM2VideoPredictor beyond the UFVideo usage
    pattern: add_new_points / add_language_embd on any frames
    (sam2.py:3585-3650, 3845-3919), memory_temporal_stride_for_eval
    (:2874-2898), and propagate_in_video with reverse / start_frame_idx
    (:4071-4153). Propagation starts at the earliest prompted frame and runs
    each direction as an independent scan from the conditioning state —
    matching a reference propagate_in_video call on a freshly prompted
    state for that direction (directions do not observe each other's
    non-cond memories; each is self-contained).

    Returns low-res mask logits [T, B, 1, h4, w4]; frames a single-direction
    call never reaches hold NO_OBJ_SCORE.
    """
    if direction not in ("forward", "reverse", "both"):
        raise ValueError(f"direction must be forward/reverse/both: {direction}")
    if not conditions:
        raise ValueError("at least one prompted frame is required")
    idcs, inputs = [], []
    for cond in conditions:
        coords, labels = cond.point_coords, cond.point_labels
        if cond.box is not None:
            # box → two corner points labeled 2/3 (prompt-encoder corner
            # embeddings, sam2.py:1640-1650); clicks may follow
            bx = cond.box.astype(jnp.float32).reshape(-1, 2, 2)
            bl = jnp.broadcast_to(
                jnp.asarray([2, 3], jnp.int32), (bx.shape[0], 2)
            )
            coords = bx if coords is None else jnp.concatenate([bx, coords], 1)
            labels = bl if labels is None else jnp.concatenate([bl, labels], 1)
        if cond.language_embd is None and coords is None:
            raise ValueError(
                f"frame {cond.frame_idx}: needs language_embd, points or box"
            )
        idcs.append(int(cond.frame_idx))
        inputs.append((cond.language_embd, coords, labels))
    return _propagate_general_jit(
        model, params, feats, tuple(inputs), tuple(idcs), int(stride),
        direction,
    )


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
        fi, s0, s1, s2 = xs
        new_state, masks = track_frame(
            model, params, carry, fi, s0, s1, s2, feats.pos2, num_frames=t
        )
        return new_state, masks

    xs = (
        jnp.arange(1, t, dtype=jnp.int32),
        feats.s0[1:], feats.s1[1:], feats.s2[1:],
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
        feats.pos2,  # frame- and video-invariant
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
