"""Typed configuration for every component of the TPU-native UFVideo stack.

The reference scatters configuration across an HF PretrainedConfig used as a
runtime bus (reference: ufvideo/train.py:873-912, model/__init__.py:67-70) and
hard-coded builder constants (sam2.py:148-325). Here every subsystem gets an
explicit frozen dataclass; `UFVideoConfig` composes them.

All shapes derived from configs are static so that everything jits cleanly.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Tuple

import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class SiglipVisionConfig:
    """SigLIP-SO400M-patch14-384 vision tower (reference: encoder.py:96-181
    delegates to HF SiglipVisionModel; these are that checkpoint's dims)."""

    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_layers: int = 27
    num_heads: int = 16
    image_size: int = 384
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    # Feature tap: hidden_states[-2], i.e. skip the final encoder layer
    # (reference: encoder.py:104,126-132 with mm_vision_select_layer=-2).
    select_layer: int = -2

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size  # 27

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size  # 729

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads  # 72

    @property
    def num_encode_layers(self) -> int:
        """Number of encoder layers actually executed for the feature tap."""
        assert self.select_layer < 0
        return self.num_layers + 1 + self.select_layer  # 26 for -2


@dataclass(frozen=True)
class Qwen2Config:
    """Qwen2-7B-Instruct LLM dims (reference wraps HF Qwen2ForCausalLM,
    videorefer_qwen2.py:113-124)."""

    vocab_size: int = 152064
    hidden_size: int = 3584
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    head_dim: int = 128
    intermediate_size: int = 18944
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    max_position_embeddings: int = 32768
    tie_word_embeddings: bool = False
    # ids of ChatML control tokens in the Qwen2 tokenizer
    eos_token_id: int = 151645  # <|im_end|>
    pad_token_id: int = 151643  # <|endoftext|>
    # rematerialize each decoder layer in the backward pass (the TPU
    # equivalent of the reference's --gradient_checkpointing,
    # scripts/train/train_1121v1.sh): trades one extra forward for not
    # storing per-layer activations
    remat: bool = False

    @property
    def padded_vocab_size(self) -> int:
        """Physical vocab rounded up for MXU-friendly lm_head matmuls."""
        return _round_up(self.vocab_size, 256)


@dataclass(frozen=True)
class ProjectorConfig:
    """Spatio-temporal connector (reference: projector.py:225-238
    STCConnectorV35 = RegStage(4) + Conv3d stride (2,2,2) pad 0 + RegStage(4)
    + 2-layer MLP readout)."""

    projector_type: str = "stc_connector_v35"
    encoder_hidden_size: int = 1152  # == SiglipVisionConfig.hidden_size
    hidden_size: int = 3584  # == Qwen2Config.hidden_size
    depth: int = 4
    mlp_depth: int = 2
    downsample: Tuple[int, int, int] = (2, 2, 2)  # (t, h, w)

    def token_grid(self, num_frames: int, vis_grid: int) -> Tuple[int, int, int]:
        """Static output grid (t, h, w) for a given input frame count and
        vision-tower patch grid. v35 uses padding=0, so dims floor-divide."""
        dt, dh, dw = self.downsample
        if self.projector_type in ("linear", "mlp2x_gelu"):
            return (1, vis_grid, vis_grid)
        if self.projector_type in ("spatial_conv", "spatial_pool"):
            dt = 1
        # conv sampler uses padding=1 except v35 (projector.py:164-174,225-238);
        # pool samplers (stp/spatial_pool) have no padding
        pad = 1 if self.projector_type in ("stc_connector", "spatial_conv") else 0
        t = (num_frames + 2 * pad - dt) // dt + 1
        h = (vis_grid + 2 * pad - dh) // dh + 1
        w = (vis_grid + 2 * pad - dw) // dw + 1
        return (t, h, w)

    def num_video_tokens(self, num_frames: int, vis_grid: int) -> int:
        t, h, w = self.token_grid(num_frames, vis_grid)
        return t * h * w


@dataclass(frozen=True)
class RegionEncoderConfig:
    """Mask-pooled region tokens (reference: layer.py:50-128 MaskExtractor)."""

    encoder_hidden_size: int = 1152
    hidden_size: int = 3584
    depth: int = 2
    region_token_num: int = 4  # static per-object token budget
    mask_shape: int = 112


@dataclass(frozen=True)
class SAM2HieraConfig:
    """Hiera-Large image-encoder trunk (reference: sam2.py:148-164)."""

    embed_dim: int = 144
    num_heads: int = 2
    stages: Tuple[int, ...] = (2, 6, 36, 4)
    global_att_blocks: Tuple[int, ...] = (23, 33, 43)
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (7, 7)
    window_spec: Tuple[int, ...] = (8, 4, 16, 8)
    dim_mul: float = 2.0
    head_mul: float = 2.0
    q_stride: Tuple[int, int] = (2, 2)
    patch_kernel: int = 7
    patch_stride: int = 4
    patch_padding: int = 3
    mlp_ratio: float = 4.0
    image_size: int = 1024
    # TPU layout: lanes per head in the qkv/proj params (zero-padded from
    # head_dim=72 by the converter; 0 = native). Round-1 padded to 128 to
    # keep head splits lane-aligned, but the window/ViT kernels slice
    # 72-lane heads in VMEM for free and the padding inflates qkv/proj
    # matmul FLOPs by 78% — native is faster end-to-end (PERF.md).
    head_pad: int = 0


@dataclass(frozen=True)
class SAM2Config:
    """SAM2 hiera-large video model (reference: sam2.py:87-325 hard-coded
    builder constants)."""

    hiera: SAM2HieraConfig = field(default_factory=SAM2HieraConfig)
    # FPN neck (sam2.py:165-190)
    fpn_dim: int = 256
    fpn_backbone_channels: Tuple[int, ...] = (1152, 576, 288, 144)
    fpn_top_down_levels: Tuple[int, ...] = (2, 3)
    scalp: int = 1  # drop lowest-res level (sam2.py:191)
    # Memory attention (sam2.py:197-266)
    mem_attn_layers: int = 4
    mem_attn_dim: int = 256
    mem_attn_dff: int = 2048
    mem_attn_num_heads: int = 1
    mem_attn_rope_theta: float = 10000.0
    mem_attn_rope_feat_sizes: Tuple[int, int] = (32, 32)
    mem_attn_kv_in_dim: int = 64
    # Memory encoder (sam2.py:268-325)
    mem_dim: int = 64
    num_maskmem: int = 7
    max_obj_ptrs_in_encoder: int = 16
    # SAM heads
    sam_embed_dim: int = 256
    sam_image_embedding_size: int = 64  # 1024/16
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    pred_obj_scores: bool = True
    # propagation
    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0


@dataclass(frozen=True)
class MultimodalBudget:
    """Static token budgets that replace the reference's dynamic-shape Python
    splicing (videorefer_arch.py:218-370). Everything is padded to these."""

    max_seq_len: int = 4096  # post-splice sequence budget
    max_text_len: int = 2048  # matches reference context_len (model/__init__.py:149)
    max_regions: int = 8  # max <region> placeholders per sample
    max_objects: int = 8  # max [SEG]-tracked objects per sample
    max_new_tokens: int = 1024
    num_frames: int = 32
    num_frames_sam: int = 4


@dataclass(frozen=True)
class UFVideoConfig:
    """Composite model config (reference composite: videorefer_arch.py:31-150)."""

    vision: SiglipVisionConfig = field(default_factory=SiglipVisionConfig)
    llm: Qwen2Config = field(default_factory=Qwen2Config)
    projector: ProjectorConfig = field(default_factory=ProjectorConfig)
    region: RegionEncoderConfig = field(default_factory=RegionEncoderConfig)
    sam: SAM2Config = field(default_factory=SAM2Config)
    budget: MultimodalBudget = field(default_factory=MultimodalBudget)

    # token ids filled in after tokenizer extension (train.py:911-912)
    region_token_id: int = -1
    seg_token_id: int = -1
    temporal_token_start_id: int = -1

    # loss weights (reference: train.py:126-128 → config, videorefer_qwen2.py:214,336-338)
    ce_loss_weight: float = 1.0
    bce_loss_weight: float = 2.0
    dice_loss_weight: float = 0.5

    # SAM text-embedding head dim (model/__init__.py:70)
    sam_out_dim: int = 256

    # dtype policy: bf16 compute / fp32 master & reductions
    compute_dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16
    # int8 weight-only LLM (bnb 4/8-bit load parity; ufvideo_tpu.quant)
    quant_llm: Any = False  # False | True/'int8' | 'int4' weight-only LLM
    # W8A8 int8 vision towers (SigLIP encoder + SAM2 Hiera trunk): the
    # compute-bound encoders run s8×s8→s32 MXU dots (quant.W8A8Dense /
    # ops/hiera_block.fused_block_w8a8); beyond-reference serving lever
    quant_vision: bool = False
    # int8 KV cache for decode (beyond-reference serving capacity lever:
    # halves the cache HBM footprint + decode read traffic; scales fold
    # into the ragged decode kernel)
    quant_kv: bool = False
    # chunked prefill for batched serving: >0 prefills this many sequences
    # at a time (bit-identical; bounds the [B*S, intermediate] transients
    # that OOM large batches — see models/generate.py)
    prefill_chunk: int = 0
    # prompt-lookup speculative decoding: >0 drafts this many tokens per
    # step and verifies them in one multi-token forward (greedy-exact;
    # models/speculative.py). Applies to greedy generation without
    # multi-token stop sequences; other calls fall back to plain decode.
    spec_decode: int = 0

    @property
    def num_video_tokens(self) -> int:
        return self.projector.num_video_tokens(
            self.budget.num_frames, self.vision.grid_size
        )

    def replace(self, **kw) -> "UFVideoConfig":
        return dataclasses.replace(self, **kw)


def tiny_config() -> UFVideoConfig:
    """A miniature config for tests: same topology, tiny dims."""
    return UFVideoConfig(
        vision=SiglipVisionConfig(
            hidden_size=32, intermediate_size=64, num_layers=3, num_heads=2,
            image_size=56, patch_size=14,
        ),
        llm=Qwen2Config(
            vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, head_dim=16, intermediate_size=128,
            eos_token_id=2, pad_token_id=0,
        ),
        projector=ProjectorConfig(encoder_hidden_size=32, hidden_size=64),
        region=RegionEncoderConfig(encoder_hidden_size=32, hidden_size=64),
        sam=SAM2Config(
            hiera=SAM2HieraConfig(
                embed_dim=16, num_heads=1, stages=(1, 2, 1, 1),
                global_att_blocks=(2,), window_spec=(4, 2, 4, 2),
                image_size=128,
            ),
            fpn_backbone_channels=(128, 64, 32, 16),
            fpn_dim=32,
            mem_attn_layers=1,
            mem_attn_dim=32,
            mem_attn_dff=64,
            mem_attn_kv_in_dim=16,
            mem_dim=16,
            sam_embed_dim=32,
            sam_image_embedding_size=8,
            iou_head_hidden_dim=32,
        ),
        budget=MultimodalBudget(
            max_seq_len=128, max_text_len=64, max_regions=2, max_objects=2,
            max_new_tokens=8, num_frames=4, num_frames_sam=2,
        ),
        sam_out_dim=32,
        compute_dtype=jnp.float32,
        param_dtype=jnp.float32,
    )
