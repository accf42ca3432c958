"""SAM2 torch checkpoint → flax param tree converter.

Maps the reference's ``sam2_hiera_large.pt`` state dict (after its
``.gamma → .g_weight`` rename, reference: sam2.py:30-85
load_checkpoint_with_prefix) onto this package's module tree. Also used by
tests to convert randomly-initialized tiny reference modules for numerical
parity checks.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from ...configs import SAM2Config
from ...weights import _conv2d, _layernorm, _linear, _np


def _ln(sd, p):
    return _layernorm(sd, p)


def _channel_ln(sd, p):
    return {"scale": _np(sd[f"{p}.weight"]), "bias": _np(sd[f"{p}.bias"])}


def _mlp(sd, p, n):
    return {f"layers_{i}": _linear(sd, f"{p}.layers.{i}") for i in range(n)}


def _attn(sd, p):
    return {
        "q_proj": _linear(sd, f"{p}.q_proj"),
        "k_proj": _linear(sd, f"{p}.k_proj"),
        "v_proj": _linear(sd, f"{p}.v_proj"),
        "out_proj": _linear(sd, f"{p}.out_proj"),
    }


def _pad_attn(qkv: Dict, proj: Dict, num_heads: int, hd: int, hp: int):
    """Zero-pad per-head qkv columns / proj rows from head_dim to head_pad
    lanes (see hiera.MultiScaleAttention.head_pad — math-preserving TPU
    layout; zero pads contribute nothing to scores or outputs)."""
    din = qkv["kernel"].shape[0]
    k = qkv["kernel"].reshape(din, 3, num_heads, hd)
    k = np.pad(k, ((0, 0), (0, 0), (0, 0), (0, hp - hd)))
    qkv = {"kernel": k.reshape(din, 3 * num_heads * hp).copy(),
           "bias": np.pad(
               qkv["bias"].reshape(3, num_heads, hd),
               ((0, 0), (0, 0), (0, hp - hd)),
           ).reshape(3 * num_heads * hp).copy()}
    dout = proj["kernel"].shape[1]
    pk = proj["kernel"].reshape(num_heads, hd, dout)
    pk = np.pad(pk, ((0, 0), (0, hp - hd), (0, 0)))
    proj = {"kernel": pk.reshape(num_heads * hp, dout).copy(),
            "bias": proj["bias"]}
    return qkv, proj


def convert_hiera(sd: Mapping, cfg: SAM2Config, prefix="image_encoder.trunk") -> Dict:
    h = cfg.hiera
    depth = sum(h.stages)
    stage_ends = [sum(h.stages[: i + 1]) - 1 for i in range(len(h.stages))]
    out: Dict[str, Any] = {
        "patch_embed": _conv2d(sd, f"{prefix}.patch_embed.proj"),
        # torch [1, C, h, w] → [h, w, C]
        "pos_embed": _np(sd[f"{prefix}.pos_embed"])[0].transpose(1, 2, 0),
        "pos_embed_window": _np(sd[f"{prefix}.pos_embed_window"])[0].transpose(1, 2, 0),
    }
    embed_dim, num_heads = h.embed_dim, h.num_heads
    for i in range(depth):
        dim_out = embed_dim
        if i - 1 in stage_ends:
            dim_out = int(embed_dim * h.dim_mul)
            num_heads = int(num_heads * h.head_mul)
        bp = f"{prefix}.blocks.{i}"
        qkv = _linear(sd, f"{bp}.attn.qkv")
        proj = _linear(sd, f"{bp}.attn.proj")
        if h.head_pad:
            qkv, proj = _pad_attn(
                qkv, proj, num_heads, dim_out // num_heads, h.head_pad
            )
        blk = {
            "norm1": _ln(sd, f"{bp}.norm1"),
            "norm2": _ln(sd, f"{bp}.norm2"),
            "attn": {"qkv": qkv, "proj": proj},
            "mlp_layers_0": _linear(sd, f"{bp}.mlp.layers.0"),
            "mlp_layers_1": _linear(sd, f"{bp}.mlp.layers.1"),
        }
        if f"{bp}.proj.weight" in sd:
            blk["proj"] = _linear(sd, f"{bp}.proj")
        out[f"blocks_{i}"] = blk
        embed_dim = dim_out
    return out


def convert_neck(sd: Mapping, cfg: SAM2Config, prefix="image_encoder.neck") -> Dict:
    return {
        f"convs_{i}": _conv2d(sd, f"{prefix}.convs.{i}.conv")
        for i in range(len(cfg.fpn_backbone_channels))
    }


def convert_prompt_encoder(sd: Mapping, prefix="sam_prompt_encoder") -> Dict:
    out: Dict[str, Any] = {
        "pe_layer": {
            "positional_encoding_gaussian_matrix": _np(
                sd[f"{prefix}.pe_layer.positional_encoding_gaussian_matrix"]
            )
        },
        "not_a_point_embed": _np(sd[f"{prefix}.not_a_point_embed.weight"])[0],
        "no_mask_embed": _np(sd[f"{prefix}.no_mask_embed.weight"])[0],
        "mask_downscaling_0": _conv2d(sd, f"{prefix}.mask_downscaling.0"),
        "mask_downscaling_1": _channel_ln(sd, f"{prefix}.mask_downscaling.1"),
        "mask_downscaling_3": _conv2d(sd, f"{prefix}.mask_downscaling.3"),
        "mask_downscaling_4": _channel_ln(sd, f"{prefix}.mask_downscaling.4"),
        "mask_downscaling_6": _conv2d(sd, f"{prefix}.mask_downscaling.6"),
    }
    for i in range(4):
        out[f"point_embeddings_{i}"] = _np(
            sd[f"{prefix}.point_embeddings.{i}.weight"]
        )[0]
    return out


def convert_mask_decoder(sd: Mapping, cfg: SAM2Config, prefix="sam_mask_decoder") -> Dict:
    nm = cfg.num_multimask_outputs + 1

    def twoway_block(bp):
        return {
            "self_attn": _attn(sd, f"{bp}.self_attn"),
            "cross_attn_token_to_image": _attn(sd, f"{bp}.cross_attn_token_to_image"),
            "cross_attn_image_to_token": _attn(sd, f"{bp}.cross_attn_image_to_token"),
            "mlp": _mlp(sd, f"{bp}.mlp", 2),
            "norm1": _ln(sd, f"{bp}.norm1"),
            "norm2": _ln(sd, f"{bp}.norm2"),
            "norm3": _ln(sd, f"{bp}.norm3"),
            "norm4": _ln(sd, f"{bp}.norm4"),
        }

    out: Dict[str, Any] = {
        "obj_score_token": _np(sd[f"{prefix}.obj_score_token.weight"]),
        "iou_token": _np(sd[f"{prefix}.iou_token.weight"]),
        "mask_tokens": _np(sd[f"{prefix}.mask_tokens.weight"]),
        "transformer": {
            "layers_0": twoway_block(f"{prefix}.transformer.layers.0"),
            "layers_1": twoway_block(f"{prefix}.transformer.layers.1"),
            "final_attn_token_to_image": _attn(
                sd, f"{prefix}.transformer.final_attn_token_to_image"
            ),
            "norm_final_attn": _ln(sd, f"{prefix}.transformer.norm_final_attn"),
        },
        "output_upscaling_0": _deconv(sd, f"{prefix}.output_upscaling.0"),
        "output_upscaling_1": _channel_ln(sd, f"{prefix}.output_upscaling.1"),
        "output_upscaling_3": _deconv(sd, f"{prefix}.output_upscaling.3"),
        "iou_prediction_head": _mlp(sd, f"{prefix}.iou_prediction_head", cfg.iou_head_depth),
        "pred_obj_score_head": _mlp(sd, f"{prefix}.pred_obj_score_head", 3),
    }
    for i in range(nm):
        out[f"output_hypernetworks_mlps_{i}"] = _mlp(
            sd, f"{prefix}.output_hypernetworks_mlps.{i}", 3
        )
    return out


def _deconv(sd: Mapping, p: str) -> Dict[str, np.ndarray]:
    # torch ConvTranspose2d weight [in, out, kh, kw] → flax [kh, kw, in, out];
    # flax's ConvTranspose applies the kernel unflipped, torch flips, so the
    # spatial dims must be reversed
    out = {
        "kernel": np.ascontiguousarray(
            _np(sd[f"{p}.weight"]).transpose(2, 3, 0, 1)[::-1, ::-1]
        )
    }
    if f"{p}.bias" in sd:
        out["bias"] = _np(sd[f"{p}.bias"])
    return out


def convert_memory_attention(sd: Mapping, cfg: SAM2Config, prefix="memory_attention") -> Dict:
    out: Dict[str, Any] = {"norm": _ln(sd, f"{prefix}.norm")}
    for i in range(cfg.mem_attn_layers):
        lp = f"{prefix}.layers.{i}"
        out[f"layers_{i}"] = {
            "self_attn": _attn(sd, f"{lp}.self_attn"),
            "cross_attn_image": _attn(sd, f"{lp}.cross_attn_image"),
            "linear1": _linear(sd, f"{lp}.linear1"),
            "linear2": _linear(sd, f"{lp}.linear2"),
            "norm1": _ln(sd, f"{lp}.norm1"),
            "norm2": _ln(sd, f"{lp}.norm2"),
            "norm3": _ln(sd, f"{lp}.norm3"),
        }
    return out


def convert_memory_encoder(sd: Mapping, prefix="memory_encoder") -> Dict:
    out: Dict[str, Any] = {
        "pix_feat_proj": _conv2d(sd, f"{prefix}.pix_feat_proj"),
        "out_proj": _conv2d(sd, f"{prefix}.out_proj"),
        "mask_downsampler": {},
    }
    for i in range(4):
        out["mask_downsampler"][f"encoder_{3 * i}"] = _conv2d(
            sd, f"{prefix}.mask_downsampler.encoder.{3 * i}"
        )
        out["mask_downsampler"][f"encoder_{3 * i + 1}"] = _channel_ln(
            sd, f"{prefix}.mask_downsampler.encoder.{3 * i + 1}"
        )
    out["mask_downsampler"]["encoder_12"] = _conv2d(
        sd, f"{prefix}.mask_downsampler.encoder.12"
    )
    for i in range(2):
        fp = f"{prefix}.fuser.layers.{i}"
        out[f"fuser_layers_{i}"] = {
            "dwconv": _conv2d(sd, f"{fp}.dwconv"),
            "norm": _channel_ln(sd, f"{fp}.norm"),
            "pwconv1": _linear(sd, f"{fp}.pwconv1"),
            "pwconv2": _linear(sd, f"{fp}.pwconv2"),
            "g_weight": _np(sd[f"{fp}.g_weight"]),
        }
    return out


def convert_sam2(sd: Mapping, cfg: SAM2Config) -> Dict[str, Any]:
    """Full SAM2VideoPredictor state dict → SAM2 flax params."""
    return {
        "image_encoder_trunk": convert_hiera(sd, cfg),
        "image_encoder_neck": convert_neck(sd, cfg),
        "sam_prompt_encoder": convert_prompt_encoder(sd),
        "sam_mask_decoder": convert_mask_decoder(sd, cfg),
        "memory_attention": convert_memory_attention(sd, cfg),
        "memory_encoder": convert_memory_encoder(sd),
        "conv_s0": _conv2d(sd, "sam_mask_decoder.conv_s0"),
        "conv_s1": _conv2d(sd, "sam_mask_decoder.conv_s1"),
        "obj_ptr_proj": _mlp(sd, "obj_ptr_proj", 3),
        "no_mem_embed": _np(sd["no_mem_embed"]),
        "no_mem_pos_enc": _np(sd["no_mem_pos_enc"]),
        "maskmem_tpos_enc": _np(sd["maskmem_tpos_enc"]),
        "no_obj_ptr": _np(sd["no_obj_ptr"]),
    }
