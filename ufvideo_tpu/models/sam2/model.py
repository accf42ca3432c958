"""SAM2 top-level model: image encoder + heads + memory, TPU-native.

Re-implements the reference SAM2Base/SAM2 wrapper behavior for the UFVideo
configuration (reference: sam2.py:87-146 builder constants, :2362-3525
SAM2Base, :3276-3460 _forward_sam_heads with the [SEG] language-embedding
extension). Flags that the UFVideo build hard-codes are baked in:

  directly_add_no_mem_embed, use_high_res_features_in_sam,
  multimask_output_in_sam (+ for tracking, 0..1 points),
  use_obj_ptrs_in_encoder (max 16, no tpos enc, past-only),
  pred_obj_scores (+mlp), fixed_no_obj_ptr, use_multimask_token_for_obj_ptr,
  use_mlp_for_obj_ptr_proj, sigmoid scale/bias 20/-10 for the memory encoder.

The memory bank interface is static-shape: callers pass stacked memory
feature maps + validity masks (see video.py for the scan-based propagation).
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...configs import SAM2Config
from .common import SamMLP, position_embedding_sine
from .hiera import FpnNeck, Hiera
from .memory import MemoryAttention, MemoryEncoder
from .prompt_mask import MaskDecoder, PromptEncoder


class SamHeadsOutput(NamedTuple):
    low_res_multimasks: jnp.ndarray  # [B, M, 4H, 4W] fp32 logits
    high_res_multimasks: jnp.ndarray  # [B, M, 16H, 16W]
    ious: jnp.ndarray  # [B, M]
    low_res_masks: jnp.ndarray  # [B, 1, 4H, 4W] best mask
    high_res_masks: jnp.ndarray  # [B, 1, 16H, 16W]
    obj_ptr: jnp.ndarray  # [B, C]
    object_score_logits: jnp.ndarray  # [B, 1]


def _upsample(masks: jnp.ndarray, size: int) -> jnp.ndarray:
    """Bilinear upsample [B, M, h, w] → [B, M, size, size] (align_corners
    False — matches F.interpolate via jax.image.resize linear)."""
    b, m, h, w = masks.shape
    return jax.image.resize(
        masks.astype(jnp.float32), (b, m, size, size), method="bilinear"
    )


class SAM2(nn.Module):
    cfg: SAM2Config
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # W8A8 int8 Hiera trunk (the encode hot path; memory/decoder heads stay
    # in the float dtype — they are a tiny share of encode time)
    quant: bool = False

    def setup(self):
        cfg = self.cfg
        dt, pt = self.dtype, self.param_dtype
        self.trunk = Hiera(
            cfg.hiera, dt, pt, quant=self.quant, name="image_encoder_trunk"
        )
        self.neck = FpnNeck(cfg, dt, pt, name="image_encoder_neck")
        self.sam_prompt_encoder = PromptEncoder(cfg, dt, pt, name="sam_prompt_encoder")
        self.sam_mask_decoder = MaskDecoder(cfg, dt, pt, name="sam_mask_decoder")
        self.memory_attention = MemoryAttention(cfg, dt, pt, name="memory_attention")
        self.memory_encoder = MemoryEncoder(cfg, dt, pt, name="memory_encoder")
        c = cfg.sam_embed_dim
        # high-res skip projections (owned by the mask decoder in the
        # reference, sam2.py:2003-2009; precomputed at encode time, :2808-2818)
        self.conv_s0 = nn.Conv(c // 8, (1, 1), dtype=dt, param_dtype=pt, name="conv_s0")
        self.conv_s1 = nn.Conv(c // 4, (1, 1), dtype=dt, param_dtype=pt, name="conv_s1")
        self.obj_ptr_proj = SamMLP(c, c, 3, dtype=dt, param_dtype=pt, name="obj_ptr_proj")
        self.no_mem_embed = self.param(
            "no_mem_embed", nn.initializers.normal(0.02), (1, 1, c), pt
        )
        self.no_mem_pos_enc = self.param(
            "no_mem_pos_enc", nn.initializers.normal(0.02), (1, 1, c), pt
        )
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc",
            nn.initializers.normal(0.02),
            (cfg.num_maskmem, 1, 1, cfg.mem_dim),
            pt,
        )
        self.no_obj_ptr = self.param(
            "no_obj_ptr", nn.initializers.normal(0.02), (1, c), pt
        )

    def __call__(self, images: jnp.ndarray):
        """Init-coverage pass: touches every submodule so ``init`` creates
        the full param tree (never used for real inference)."""
        cfg = self.cfg
        out = self.forward_image(images)
        s0, s1, s2 = out["backbone_fpn"]
        b = s2.shape[0]
        h = w = cfg.sam_image_embedding_size
        hw = h * w
        pix = self.no_memory_features(
            s2.reshape(b, hw, cfg.sam_embed_dim)
        ).reshape(b, h, w, cfg.sam_embed_dim)
        lang = jnp.zeros((b, 1, cfg.sam_embed_dim), self.dtype)
        heads = self.forward_sam_heads(pix, [s0, s1], lang)
        mem = self.encode_memory(
            s2, heads.high_res_masks.transpose(0, 2, 3, 1)
        )
        tok_per_ptr = cfg.sam_embed_dim // cfg.mem_dim
        cond = self.condition_on_memory(
            s2.reshape(b, hw, cfg.sam_embed_dim),
            out["vision_pos_enc"][2].reshape(b, hw, cfg.sam_embed_dim),
            mem.reshape(b, 1, hw, cfg.mem_dim),
            jnp.ones((b, 1), bool),
            jnp.zeros((1,), jnp.int32),
            heads.obj_ptr[:, None],
            jnp.ones((b, 1), bool),
            (h, w),
        )
        return heads.low_res_masks, cond

    # ------------------------------------------------------------------
    # image encoding
    # ------------------------------------------------------------------

    def forward_image(self, images: jnp.ndarray) -> Dict[str, List[jnp.ndarray]]:
        """[B, 1024, 1024, 3] → dict with 3 NHWC feature levels (s0 256²x32
        after conv_s0, s1 128²x64 after conv_s1, s2 64²x256) and their sine
        pos embeds. Mirrors forward_image + scalp (sam2.py:2805-2818,
        784-813)."""
        feats = self.trunk(images)
        features, pos = self.neck(feats)
        # scalp=1: drop the lowest-resolution level (sam2.py:799-807);
        # guarded like the reference — [:-0] would empty the list
        if self.cfg.scalp > 0:
            features = features[: -self.cfg.scalp]
            pos = pos[: -self.cfg.scalp]
        features = [self.conv_s0(features[0]), self.conv_s1(features[1]), features[2]]
        return {"backbone_fpn": features, "vision_pos_enc": pos}

    # ------------------------------------------------------------------
    # SAM heads
    # ------------------------------------------------------------------

    def forward_sam_heads(
        self,
        backbone_features: jnp.ndarray,  # [B, H, W, C] memory-conditioned
        high_res_features: List[jnp.ndarray],  # [(B,4H,4W,C/8), (B,2H,2W,C/4)]
        language_embd: Optional[jnp.ndarray] = None,  # [B, 1, C]
        point_coords: Optional[jnp.ndarray] = None,  # [B, P, 2]
        point_labels: Optional[jnp.ndarray] = None,  # [B, P]
        mask_inputs: Optional[jnp.ndarray] = None,  # [B, 4H*4, 4W*4, 1]
        multimask_output: bool = True,
        training: bool = False,  # gates the stability fallback (sam2.py:2074)
    ) -> SamHeadsOutput:
        cfg = self.cfg
        b = backbone_features.shape[0]
        if point_coords is None:
            point_coords = jnp.zeros((b, 1, 2), jnp.float32)
            point_labels = -jnp.ones((b, 1), jnp.int32)
        sparse, dense = self.sam_prompt_encoder(point_coords, point_labels, mask_inputs)
        if language_embd is not None:
            sparse = jnp.concatenate(
                [sparse, language_embd.astype(sparse.dtype)], axis=1
            )  # (sam2.py:3368-3379)

        masks, ious, sam_tokens, obj_logits = self.sam_mask_decoder(
            backbone_features,
            self.sam_prompt_encoder.dense_pe(),
            sparse,
            dense,
            high_res_features,
            multimask_output,
            apply_stability=not training,
        )
        # the upstream-SAM2 hard obj/no-obj mask flooring is DISABLED: the
        # reference comments out that torch.where (sam2.py:3395-3406), so
        # mask logits pass through raw even when obj_logits <= 0 (flooring
        # here would also kill mask-path gradients for those samples);
        # obj score still gates the obj pointer below (sam2.py:3433-3443)
        is_obj = obj_logits > 0
        high_res = _upsample(masks, cfg.hiera.image_size)

        if multimask_output:
            best = jnp.argmax(ious, axis=-1)
            bidx = jnp.arange(b)
            low_res_masks = masks[bidx, best][:, None]
            high_res_masks = high_res[bidx, best][:, None]
            sam_token = sam_tokens[bidx, best]
        else:
            low_res_masks, high_res_masks = masks, high_res
            sam_token = sam_tokens[:, 0]

        obj_ptr = self.obj_ptr_proj(sam_token)
        lam = is_obj.astype(jnp.float32)  # [B, 1]
        # fixed_no_obj_ptr (sam2.py:2736-2741)
        obj_ptr = lam * obj_ptr + (1.0 - lam) * self.no_obj_ptr.astype(jnp.float32)

        return SamHeadsOutput(
            masks, high_res, ious, low_res_masks, high_res_masks,
            obj_ptr, obj_logits,
        )

    # ------------------------------------------------------------------
    # memory
    # ------------------------------------------------------------------

    def condition_on_memory(
        self,
        curr_feat: jnp.ndarray,  # [B, HW, C] top-level features
        curr_pos: jnp.ndarray,  # [B, HW, C]
        mem_feats: jnp.ndarray,  # [B, M, HW, mem_dim] slot 0=cond, 1..=newest..oldest
        mem_valid: jnp.ndarray,  # [B, M] bool
        mem_tpos_idx: jnp.ndarray,  # [M] int — index into maskmem_tpos_enc
        obj_ptrs: jnp.ndarray,  # [B, P, C] pointer vectors
        ptr_valid: jnp.ndarray,  # [B, P] bool
        feat_hw: Tuple[int, int],
    ) -> jnp.ndarray:
        """Static-shape _prepare_memory_conditioned_features
        (sam2.py:2834-3003): invalid memory slots / pointers are masked out of
        the cross-attention instead of being dropped from a Python list."""
        cfg = self.cfg
        b, m, hw, md = mem_feats.shape
        h, w = feat_hw
        c = cfg.sam_embed_dim

        spat_pos = position_embedding_sine(h, w, cfg.mem_dim).reshape(1, 1, hw, cfg.mem_dim)
        tpos = jnp.take(
            jnp.asarray(self.maskmem_tpos_enc), mem_tpos_idx, axis=0
        ).reshape(1, m, 1, md)
        mem_pos = (spat_pos + tpos).astype(jnp.float32)
        mem_pos = jnp.broadcast_to(mem_pos, (b, m, hw, md)).reshape(b, m * hw, md)
        memory = mem_feats.reshape(b, m * hw, md)

        # object pointers: split each C-dim pointer into C/mem_dim tokens
        # (sam2.py:2969-2976)
        p = obj_ptrs.shape[1]
        tok_per_ptr = c // cfg.mem_dim
        ptr_tokens = obj_ptrs.reshape(b, p * tok_per_ptr, cfg.mem_dim)
        ptr_pos = jnp.zeros_like(ptr_tokens)  # add_tpos_enc_to_obj_ptrs=False
        ptr_mask = jnp.repeat(ptr_valid, tok_per_ptr, axis=1)

        kv = jnp.concatenate([memory, ptr_tokens.astype(memory.dtype)], axis=1)
        kv_pos = jnp.concatenate([mem_pos, ptr_pos.astype(jnp.float32)], axis=1)
        kv_mask = jnp.concatenate(
            [jnp.repeat(mem_valid, hw, axis=1), ptr_mask], axis=1
        )

        out = self.memory_attention(
            curr_feat.astype(self.dtype),
            curr_pos.astype(self.dtype),
            kv.astype(self.dtype),
            kv_pos.astype(self.dtype),
            num_obj_ptr_tokens=p * tok_per_ptr,
            kv_mask=kv_mask,
        )
        return out

    def no_memory_features(self, curr_feat: jnp.ndarray) -> jnp.ndarray:
        """Initial cond frame: directly add the no-mem embedding
        (sam2.py:2984-2989)."""
        return curr_feat + self.no_mem_embed.astype(curr_feat.dtype)

    def encode_memory(
        self, pix_feat: jnp.ndarray, high_res_masks: jnp.ndarray
    ) -> jnp.ndarray:
        """[B, H, W, C] feats + [B, 16H, 16W, 1] mask logits → [B, H, W, mem]
        (sam2.py:3005-3058 with sigmoid scale 20 / bias -10)."""
        cfg = self.cfg
        m = nn.sigmoid(high_res_masks.astype(jnp.float32))
        m = m * cfg.sigmoid_scale_for_mem_enc + cfg.sigmoid_bias_for_mem_enc
        return self.memory_encoder(pix_feat, m.astype(self.dtype), skip_mask_sigmoid=True)
