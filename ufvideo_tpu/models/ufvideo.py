"""Composite UFVideo model: vision tower + projector + region encoder +
Qwen2 LLM + [SEG] text head (+ SAM2, attached separately).

TPU-native re-design of the reference composite (reference:
videorefer_arch.py:31-150 VideoReferMetaModel, videorefer_qwen2.py:113-352).
Rather than one torch nn.Module with dynamic-shape splicing, this is a thin
orchestrator over functional flax modules with a params dict:

    params = {"vision": ..., "projector": ..., "region": ..., "llm": ...,
              "text_fcs": ...}

All device entry points are pure functions of (params, arrays) and jit/pjit
cleanly; host-side layout planning lives in ufvideo_tpu.splicing.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import UFVideoConfig
from ..splicing import apply_splice
from .projector import build_projector
from .qwen2 import Qwen2LM
from .region_encoder import RegionProjector, extract_region_tokens
from .siglip import SiglipVisionTower


class TextHiddenFC(nn.Module):
    """[SEG] hidden-state head: Linear → ReLU → Linear to sam_out_dim
    (reference: videorefer_arch.py:140-146 text_hidden_fcs)."""

    hidden_size: int
    out_dim: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(
            self.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype,
            name="fc0",
        )(x.astype(self.dtype))
        x = nn.relu(x)
        return nn.Dense(
            self.out_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="fc1",
        )(x)


class UFVideoModel:
    """Orchestrator. Not an nn.Module by design: sub-networks are applied
    through explicit pure functions so prefill/decode/training can compose
    them freely under jit."""

    def __init__(self, cfg: UFVideoConfig, ring=None, lora_term=None,
                 pp=None):
        """``ring``: optional (mesh, seq_axis, batch_axis) enabling
        sequence-parallel (ring) attention in the LLM's train path.
        ``lora_term``: optional (scale, dropout) enabling forward-term LoRA
        in the LLM (train/lora.py; needed for PEFT-exact lora_dropout).
        ``pp``: optional (mesh, pipe_axis, num_microbatches, data_axis)
        running the LLM's train-mode backbone as a GPipe pipeline over
        mesh[pipe_axis] (parallel/pipeline.py)."""
        self.cfg = cfg
        self.ring = ring
        dt, pt = cfg.compute_dtype, cfg.param_dtype
        self.vision = SiglipVisionTower(
            cfg.vision, dtype=dt, param_dtype=pt, quant=cfg.quant_vision
        )
        self.projector = build_projector(cfg.projector, dtype=dt, param_dtype=pt)
        self.region = RegionProjector(cfg.region, dtype=dt, param_dtype=pt)
        self.llm = Qwen2LM(
            cfg.llm, dtype=dt, param_dtype=pt, quant=cfg.quant_llm, ring=ring,
            lora_term=lora_term, pp=pp,
        )
        self.text_fcs = TextHiddenFC(
            cfg.llm.hidden_size, cfg.sam_out_dim, dtype=dt, param_dtype=pt
        )

    # ---------------- init ----------------

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        cfg = self.cfg
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
        vis_in = jnp.zeros(
            (1, cfg.vision.image_size, cfg.vision.image_size, 3), jnp.float32
        )
        proj_in = jnp.zeros(
            (1, cfg.budget.num_frames, cfg.vision.num_patches,
             cfg.vision.hidden_size),
            jnp.float32,
        )
        return {
            "vision": self.vision.init(k1, vis_in)["params"],
            "projector": self.projector.init(k2, proj_in)["params"],
            "region": self.region.init(
                k3, jnp.zeros((1, cfg.vision.hidden_size))
            )["params"],
            "llm": self.llm.init(
                k4, jnp.zeros((1, 8), jnp.int32)
            )["params"],
            "text_fcs": self.text_fcs.init(
                k5, jnp.zeros((1, cfg.llm.hidden_size))
            )["params"],
        }

    # ---------------- encoders ----------------

    def encode_video(self, params, pixels: jnp.ndarray) -> jnp.ndarray:
        """[B, T, H, W, 3] frames → [B, V, hidden] video tokens.

        The (b·t) flattened ViT batch + temporal aggregation mirrors
        encode_images_or_videos (videorefer_arch.py:168-216) but with NHWC
        layout and a single fused projector call.
        """
        b, t, h, w, c = pixels.shape
        flat = pixels.reshape(b * t, h, w, c)
        feats = self.vision.apply({"params": params["vision"]}, flat)
        feats = feats.reshape(b, t, feats.shape[1], feats.shape[2])
        return self.projector.apply({"params": params["projector"]}, feats)

    def encode_regions(
        self,
        params,
        frame_pixels: jnp.ndarray,  # [B, F, H, W, 3] annotated frames
        masks: jnp.ndarray,  # [B, F, Hm, Wm]
        frame_valid: jnp.ndarray,  # [B, F] bool
        region_segments: jnp.ndarray,  # [B, R, F] bool
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """→ ([B, R*rt, hidden] region tokens, [B, R*rt] validity).

        First-frame ViT encode + mask pooling + static token merge + MLP
        (reference: videorefer_arch.py:229-236, layer.py:63-128).
        """
        cfg = self.cfg
        b, f, h, w, c = frame_pixels.shape
        flat = frame_pixels.reshape(b * f, h, w, c)
        feats = self.vision.apply({"params": params["vision"]}, flat)
        feats = feats.reshape(b, f, feats.shape[1], feats.shape[2])

        def per_sample(fe, ma, fv, seg):
            return extract_region_tokens(
                fe, ma, fv, seg, cfg.region.region_token_num
            )

        tokens, valid = jax.vmap(per_sample)(
            feats, masks, frame_valid, region_segments
        )  # [B, R, rt, C], [B, R, rt]
        rt = tokens.shape
        tokens = tokens.reshape(b, rt[1] * rt[2], rt[3])
        valid = valid.reshape(b, rt[1] * rt[2])
        tokens = self.region.apply({"params": params["region"]}, tokens)
        return tokens, valid

    # ---------------- splice + LLM ----------------

    def splice_embeds(
        self,
        params,
        text_ids: jnp.ndarray,  # [B, T] sentinel-free ids
        src_kind: jnp.ndarray,  # [B, S]
        src_idx: jnp.ndarray,  # [B, S]
        video_feats: Optional[jnp.ndarray],
        region_feats: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        text_embeds = self.llm.apply(
            {"params": params["llm"]}, text_ids, method=Qwen2LM.embed
        )
        return apply_splice(
            text_embeds, video_feats, region_feats, src_kind, src_idx
        )

    def seg_embeddings(self, params, hidden: jnp.ndarray) -> jnp.ndarray:
        """Final-layer hidden states → 256-d SAM prompt embeddings
        (videorefer_qwen2.py:226-231)."""
        return self.text_fcs.apply({"params": params["text_fcs"]}, hidden)
