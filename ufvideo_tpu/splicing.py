"""Static-shape multimodal sequence splicing.

The reference splices precomputed video embeddings at `<video>` sentinels and
mask-pooled region tokens at `<region>` token positions with Python loops over
dynamic shapes (reference: videorefer_arch.py:218-370) — the single biggest
obstacle to XLA compilation. Here the splice is split into:

  1. ``plan_splice`` — host-side (numpy) layout planning. Every sample's final
     sequence is described by two integer maps over a fixed ``max_seq_len``
     budget: ``src_kind`` (0=text, 1=video, 2=region, 3=pad) and ``src_idx``
     (position within that source). Region token counts are host-known
     (min(#annotated frames, region_token_num)), so the plan is exact.
  2. ``apply_splice`` — device-side: three ``take_along_axis`` gathers + two
     ``where`` selects. Fully static, fuses into the embedding lookup.

Labels and attention masks fall out of the same plan (inserted positions get
IGNORE_INDEX, matching videorefer_arch.py:282-309).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from .constants import IGNORE_INDEX, MODAL_INDEX_MAP

KIND_TEXT = 0
KIND_VIDEO = 1
KIND_REGION = 2
KIND_PAD = 3


@dataclass
class SplicePlan:
    src_kind: np.ndarray  # [B, S] int32
    src_idx: np.ndarray  # [B, S] int32 (index within the source stream)
    seq_lens: np.ndarray  # [B] int32 — valid spliced length
    text_ids: np.ndarray  # [B, T] int32 — original ids, sentinels → pad(0)
    labels: Optional[np.ndarray]  # [B, S] int32 or None
    # position (in the spliced sequence) where each original text position
    # landed; -1 for sentinel positions. Used to map [SEG] input positions
    # (videorefer_qwen2.py:470-476).
    text_pos_map: np.ndarray  # [B, T] int32


def plan_splice(
    input_ids: Sequence[Sequence[int]],
    *,
    num_video_tokens: int,
    region_token_counts: Sequence[Sequence[int]],
    region_token_id: int,
    max_seq_len: int,
    labels: Optional[Sequence[Sequence[int]]] = None,
    region_stride: int = 0,
) -> SplicePlan:
    """Build the static splice layout for a batch.

    ``region_token_counts[b]`` lists, in order, the number of merged tokens
    for each ``<region>`` placeholder in sample b. The region feature stream
    is [R, region_token_num, D] flattened, so region r's tokens start at
    ``r * region_stride`` (region_stride = region_token_num).
    """
    b = len(input_ids)
    t_max = max((len(x) for x in input_ids), default=1)
    src_kind = np.full((b, max_seq_len), KIND_PAD, np.int32)
    src_idx = np.zeros((b, max_seq_len), np.int32)
    seq_lens = np.zeros((b,), np.int32)
    text_ids = np.zeros((b, t_max), np.int32)
    text_pos_map = np.full((b, t_max), -1, np.int32)
    out_labels = (
        np.full((b, max_seq_len), IGNORE_INDEX, np.int32)
        if labels is not None
        else None
    )

    modal_ids = set(MODAL_INDEX_MAP.values())
    for bi, ids in enumerate(input_ids):
        rc = list(region_token_counts[bi]) if region_token_counts else []
        pos = 0
        ri = 0  # region placeholder index
        region_base = 0  # offset into the flattened region stream
        for ti, tok in enumerate(ids):
            if tok in modal_ids:
                if pos + num_video_tokens > max_seq_len:
                    raise ValueError(
                        f"sample {bi}: splice overflows budget {max_seq_len}"
                    )
                src_kind[bi, pos : pos + num_video_tokens] = KIND_VIDEO
                src_idx[bi, pos : pos + num_video_tokens] = np.arange(
                    num_video_tokens
                )
                pos += num_video_tokens
                text_ids[bi, ti] = 0
            elif tok == region_token_id and ri < len(rc):
                n = rc[ri]
                if pos + n > max_seq_len:
                    raise ValueError(
                        f"sample {bi}: splice overflows budget {max_seq_len}"
                    )
                src_kind[bi, pos : pos + n] = KIND_REGION
                src_idx[bi, pos : pos + n] = region_base + np.arange(n)
                pos += n
                region_base += region_stride if region_stride else n
                ri += 1
                text_ids[bi, ti] = 0
            else:
                if pos >= max_seq_len:
                    raise ValueError(
                        f"sample {bi}: splice overflows budget {max_seq_len}"
                    )
                src_kind[bi, pos] = KIND_TEXT
                src_idx[bi, pos] = ti
                text_pos_map[bi, ti] = pos
                if out_labels is not None:
                    out_labels[bi, pos] = labels[bi][ti]
                pos += 1
                text_ids[bi, ti] = tok
        seq_lens[bi] = pos

    return SplicePlan(
        src_kind=src_kind,
        src_idx=src_idx,
        seq_lens=seq_lens,
        text_ids=text_ids,
        labels=out_labels,
        text_pos_map=text_pos_map,
    )


def plan_lookup_ids(plan: "SplicePlan") -> np.ndarray:
    """[B, S] token ids aligned to SPLICED positions: the original text id at
    text positions, -1 at video/region/pad slots. Feed for prompt-lookup
    speculative drafting (models/speculative.py) — generation context
    positions are spliced positions, so n-gram matches must be taken in this
    coordinate system."""
    ti = np.clip(plan.src_idx, 0, plan.text_ids.shape[1] - 1)
    ids = np.take_along_axis(plan.text_ids, ti, axis=1)
    return np.where(plan.src_kind == KIND_TEXT, ids, -1).astype(np.int32)


def apply_splice(
    text_embeds,  # [B, T, D]
    video_feats,  # [B, V, D] or None
    region_feats,  # [B, RT, D] or None
    src_kind,  # [B, S]
    src_idx,  # [B, S]
):
    """Device-side splice: gather from each source and select by kind."""
    import jax.numpy as jnp

    def gather(src, max_idx):
        idx = jnp.clip(src_idx, 0, max_idx - 1)[..., None]
        return jnp.take_along_axis(src, idx, axis=1)

    out = gather(text_embeds, text_embeds.shape[1])
    if video_feats is not None:
        v = gather(video_feats, video_feats.shape[1])
        out = jnp.where((src_kind == KIND_VIDEO)[..., None], v, out)
    if region_feats is not None:
        r = gather(region_feats, region_feats.shape[1])
        out = jnp.where((src_kind == KIND_REGION)[..., None], r, out)
    out = jnp.where((src_kind == KIND_PAD)[..., None], 0.0, out)
    return out
