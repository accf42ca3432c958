"""Checkpoint export: JAX param pytrees → reference torch state dicts.

The exact inverse of the converters in ``weights.py`` / ``models/sam2/
convert.py``, so that models trained in this framework can be loaded (and
cross-validated) by the reference stack:

  1. full model checkpoints with the reference's key layout
     (``model.embed_tokens.weight`` … ``model.mask_encoder.sam2_model.*``),
     the format ``safe_save_model_for_hf_trainer`` writes
     (reference: videorefer_trainer.py:93-146) and
     ``load_pretrained_model`` reads (model/__init__.py:39-133);
  2. adapter-only ``mm_projector.bin`` / ``region_encoder.bin``
     (videorefer_trainer.py:343-385, consumed by projector.py:49-63);
  3. a standalone SAM2 ``.pt`` with the ``.g_weight → .gamma`` inverse
     rename (the reference renames ``.gamma → .g_weight`` at load,
     sam2.py:30-85).

Everything here is host-side numpy/torch; round-trip identity
(convert(export(params)) == params) is tested in tests/test_export.py.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from .configs import Qwen2Config, SAM2Config, SiglipVisionConfig, UFVideoConfig


def _f32(x) -> np.ndarray:
    """JAX/numpy array → plain float32 numpy (handles ml_dtypes bfloat16,
    which torch.from_numpy cannot consume). Integer arrays pass through."""
    arr = np.asarray(x)
    if arr.dtype.kind in "iub":
        return arr
    if arr.dtype != np.float32:
        arr = np.asarray(arr, dtype=np.float32)
    return arr


def _t(x):
    """JAX/numpy array → torch tensor (fp32 for float inputs)."""
    import torch

    arr = np.ascontiguousarray(_f32(x))
    if not arr.flags.writeable:
        arr = arr.copy()
    return torch.from_numpy(arr)


def _inv_linear(p: Dict, prefix: str, out: Dict) -> None:
    out[f"{prefix}.weight"] = _t(_f32(p["kernel"]).T)
    if "bias" in p:
        out[f"{prefix}.bias"] = _t(p["bias"])


def _inv_layernorm(p: Dict, prefix: str, out: Dict) -> None:
    out[f"{prefix}.weight"] = _t(p["scale"])
    out[f"{prefix}.bias"] = _t(p["bias"])


def _inv_rmsnorm(p: Dict, prefix: str, out: Dict) -> None:
    out[f"{prefix}.weight"] = _t(p["scale"])


def _inv_conv2d(p: Dict, prefix: str, out: Dict) -> None:
    # flax [kh, kw, in, out] → torch [out, in, kh, kw]
    out[f"{prefix}.weight"] = _t(_f32(p["kernel"]).transpose(3, 2, 0, 1))
    if "bias" in p:
        out[f"{prefix}.bias"] = _t(p["bias"])


def _inv_conv3d(p: Dict, prefix: str, out: Dict) -> None:
    # flax [kt, kh, kw, in, out] → torch [out, in, kt, kh, kw]
    out[f"{prefix}.weight"] = _t(_f32(p["kernel"]).transpose(4, 3, 0, 1, 2))
    if "bias" in p:
        out[f"{prefix}.bias"] = _t(p["bias"])


def _inv_deconv(p: Dict, prefix: str, out: Dict) -> None:
    # inverse of convert.py _deconv: flax [kh, kw, in, out] (spatially
    # flipped) → torch ConvTranspose2d [in, out, kh, kw]
    k = _f32(p["kernel"])[::-1, ::-1].transpose(2, 3, 0, 1)
    out[f"{prefix}.weight"] = _t(np.ascontiguousarray(k))
    if "bias" in p:
        out[f"{prefix}.bias"] = _t(p["bias"])


def _inv_mlp(p: Dict, prefix: str, n: int, out: Dict) -> None:
    for i in range(n):
        _inv_linear(p[f"layers_{i}"], f"{prefix}.layers.{i}", out)


def _inv_attn(p: Dict, prefix: str, out: Dict) -> None:
    for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
        _inv_linear(p[name], f"{prefix}.{name}", out)


def _layer_slice(stacked: Any, i: int) -> Any:
    """Un-stack one layer of an nn.scan parameter subtree."""
    import jax

    return jax.tree.map(lambda x: np.asarray(x[i]), stacked)


# --------------------------------------------------------------------------
# Qwen2 (inverse of weights.convert_qwen2)
# --------------------------------------------------------------------------

def export_qwen2(params: Dict, cfg: Qwen2Config) -> Dict[str, Any]:
    """Qwen2LM params → HF Qwen2ForCausalLM state dict (vocab unpadded,
    fused qkv split back into q/k/v)."""
    out: Dict[str, Any] = {}
    v = cfg.vocab_size
    out["model.embed_tokens.weight"] = _t(
        _f32(params["embed_tokens"]["embedding"])[:v]
    )
    nq = cfg.num_heads * cfg.head_dim
    nkv = cfg.num_kv_heads * cfg.head_dim
    for i in range(cfg.num_layers):
        lp = f"model.layers.{i}"
        layer = _layer_slice(params["layers"], i)
        qkv_k = _f32(layer["self_attn_qkv_proj"]["kernel"])
        qkv_b = _f32(layer["self_attn_qkv_proj"]["bias"])
        for name, sl in (
            ("q_proj", slice(0, nq)),
            ("k_proj", slice(nq, nq + nkv)),
            ("v_proj", slice(nq + nkv, nq + 2 * nkv)),
        ):
            out[f"{lp}.self_attn.{name}.weight"] = _t(qkv_k[:, sl].T)
            out[f"{lp}.self_attn.{name}.bias"] = _t(qkv_b[sl])
        _inv_linear(layer["self_attn_o_proj"], f"{lp}.self_attn.o_proj", out)
        for m in ("gate_proj", "up_proj", "down_proj"):
            _inv_linear(layer[f"mlp_{m}"], f"{lp}.mlp.{m}", out)
        _inv_rmsnorm(layer["input_layernorm"], f"{lp}.input_layernorm", out)
        _inv_rmsnorm(
            layer["post_attention_layernorm"],
            f"{lp}.post_attention_layernorm", out,
        )
    _inv_rmsnorm(params["norm"], "model.norm", out)
    if not cfg.tie_word_embeddings:
        out["lm_head.weight"] = _t(_f32(params["lm_head"]["kernel"]).T[:v])
    return out


# --------------------------------------------------------------------------
# SigLIP (inverse of weights.convert_siglip)
# --------------------------------------------------------------------------

def export_siglip(params: Dict, cfg: SiglipVisionConfig) -> Dict[str, Any]:
    """SiglipVisionTower params → HF SiglipVisionModel state dict.

    Only the ``num_encode_layers`` the feature tap executes exist in this
    framework (the reference never runs the final layer either,
    encoder.py:126-132) — the exported dict carries those; HF loads the
    remainder with its init, which the −2 tap never reads."""
    p = "vision_model"
    out: Dict[str, Any] = {
        f"{p}.embeddings.patch_embedding.weight": _t(
            _f32(params["patch_embedding_kernel"]).transpose(3, 2, 0, 1)
        ),
        f"{p}.embeddings.patch_embedding.bias": _t(
            params["patch_embedding_bias"]
        ),
        f"{p}.embeddings.position_embedding.weight": _t(
            params["position_embedding"]
        ),
    }
    h = cfg.hidden_size
    for i in range(cfg.num_encode_layers):
        lp = f"{p}.encoder.layers.{i}"
        layer = _layer_slice(params["layers"], i)
        _inv_layernorm(layer["layer_norm1"], f"{lp}.layer_norm1", out)
        _inv_layernorm(layer["layer_norm2"], f"{lp}.layer_norm2", out)
        qkv_k = _f32(layer["self_attn"]["qkv_proj"]["kernel"])
        qkv_b = _f32(layer["self_attn"]["qkv_proj"]["bias"])
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            out[f"{lp}.self_attn.{name}.weight"] = _t(
                qkv_k[:, j * h : (j + 1) * h].T
            )
            out[f"{lp}.self_attn.{name}.bias"] = _t(qkv_b[j * h : (j + 1) * h])
        _inv_linear(
            layer["self_attn"]["out_proj"], f"{lp}.self_attn.out_proj", out
        )
        _inv_linear(layer["mlp"]["fc1"], f"{lp}.mlp.fc1", out)
        _inv_linear(layer["mlp"]["fc2"], f"{lp}.mlp.fc2", out)
    return out


# --------------------------------------------------------------------------
# STC projector / region encoder / text_hidden_fcs
# --------------------------------------------------------------------------

def export_stc_projector(
    params: Dict, depth: int = 4, mlp_depth: int = 2
) -> Dict[str, Any]:
    """Inverse of weights.convert_stc_projector (timm RegStage naming)."""
    out: Dict[str, Any] = {}
    for stage in ("s1", "s2"):
        for i in range(depth):
            bp = f"{stage}.b{i + 1}"
            blk = params[stage][f"b{i + 1}"]
            _inv_conv2d(blk["conv1"], f"{bp}.conv1.conv", out)
            _inv_layernorm(blk["conv1_ln"], f"{bp}.conv1.bn", out)
            _inv_conv2d(blk["conv2"], f"{bp}.conv2.conv", out)
            _inv_layernorm(blk["conv2_ln"], f"{bp}.conv2.bn", out)
            _inv_conv2d(blk["se_fc1"], f"{bp}.se.fc1", out)
            _inv_conv2d(blk["se_fc2"], f"{bp}.se.fc2", out)
            _inv_conv2d(blk["conv3"], f"{bp}.conv3.conv", out)
            _inv_layernorm(blk["conv3_ln"], f"{bp}.conv3.bn", out)
            if "downsample" in blk:
                _inv_conv2d(blk["downsample"], f"{bp}.downsample.conv", out)
                _inv_layernorm(blk["downsample_ln"], f"{bp}.downsample.bn", out)
    _inv_conv3d(params["sampler"], "sampler.0", out)
    for i in range(mlp_depth):
        _inv_linear(params["readout"][f"fc{2 * i}"], f"readout.{2 * i}", out)
    return out


def export_linear_projector(params: Dict) -> Dict[str, Any]:
    """Inverse of weights.convert_linear_projector ('linear'/'mlpNx_gelu':
    reference nn.Sequential indices 0, 2, 4, … — odd slots are
    parameter-free GELUs)."""
    out: Dict[str, Any] = {}
    for name, leaf in params.items():  # fc0, fc2, ...
        _inv_linear(leaf, name.removeprefix("fc"), out)
    return out


def export_projector(params: Dict, pcfg) -> Dict[str, Any]:
    """Route on projector_type (mirrors models.projector.build_projector) —
    every trainable projector flavor must export, not just stc_*."""
    import re as _re

    t = pcfg.projector_type
    if t == "linear" or _re.match(r"^mlp(\d+)x_gelu$", t):
        return export_linear_projector(params)
    return export_stc_projector(
        params, depth=pcfg.depth, mlp_depth=pcfg.mlp_depth
    )


def export_region_encoder(params: Dict) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    _inv_linear(params["fc0"], "feat_linear.0", out)
    _inv_linear(params["fc2"], "feat_linear.2", out)
    return out


def export_text_hidden_fcs(params: Dict) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    _inv_linear(params["fc0"], "text_hidden_fcs.0.0", out)
    _inv_linear(params["fc1"], "text_hidden_fcs.0.2", out)
    return out


# --------------------------------------------------------------------------
# SAM2 (inverse of models/sam2/convert.py)
# --------------------------------------------------------------------------

def _unpad_attn(qkv: Dict, proj: Dict, num_heads: int, hd: int, hp: int):
    """Inverse of convert._pad_attn: strip the zero lane padding."""
    din = _f32(qkv["kernel"]).shape[0]
    k = _f32(qkv["kernel"]).reshape(din, 3, num_heads, hp)[..., :hd]
    b = _f32(qkv["bias"]).reshape(3, num_heads, hp)[..., :hd]
    qkv = {
        "kernel": k.reshape(din, 3 * num_heads * hd),
        "bias": b.reshape(3 * num_heads * hd),
    }
    dout = _f32(proj["kernel"]).shape[1]
    pk = _f32(proj["kernel"]).reshape(num_heads, hp, dout)[:, :hd]
    proj = {"kernel": pk.reshape(num_heads * hd, dout), "bias": proj["bias"]}
    return qkv, proj


def export_hiera(
    params: Dict, cfg: SAM2Config, out: Dict, prefix="image_encoder.trunk"
) -> None:
    h = cfg.hiera
    depth = sum(h.stages)
    stage_ends = [sum(h.stages[: i + 1]) - 1 for i in range(len(h.stages))]
    _inv_conv2d(params["patch_embed"], f"{prefix}.patch_embed.proj", out)
    out[f"{prefix}.pos_embed"] = _t(
        _f32(params["pos_embed"]).transpose(2, 0, 1)[None]
    )
    out[f"{prefix}.pos_embed_window"] = _t(
        _f32(params["pos_embed_window"]).transpose(2, 0, 1)[None]
    )
    embed_dim, num_heads = h.embed_dim, h.num_heads
    for i in range(depth):
        dim_out = embed_dim
        if i - 1 in stage_ends:
            dim_out = int(embed_dim * h.dim_mul)
            num_heads = int(num_heads * h.head_mul)
        bp = f"{prefix}.blocks.{i}"
        blk = params[f"blocks_{i}"]
        qkv, proj = blk["attn"]["qkv"], blk["attn"]["proj"]
        if h.head_pad:
            qkv, proj = _unpad_attn(
                qkv, proj, num_heads, dim_out // num_heads, h.head_pad
            )
        _inv_linear(qkv, f"{bp}.attn.qkv", out)
        _inv_linear(proj, f"{bp}.attn.proj", out)
        _inv_layernorm(blk["norm1"], f"{bp}.norm1", out)
        _inv_layernorm(blk["norm2"], f"{bp}.norm2", out)
        _inv_linear(blk["mlp_layers_0"], f"{bp}.mlp.layers.0", out)
        _inv_linear(blk["mlp_layers_1"], f"{bp}.mlp.layers.1", out)
        if "proj" in blk:
            _inv_linear(blk["proj"], f"{bp}.proj", out)
        embed_dim = dim_out


def export_sam2(params: Dict, cfg: SAM2Config) -> Dict[str, Any]:
    """SAM2 flax params → reference module-space state dict (``.g_weight``
    naming; apply :func:`rename_g_weight_to_gamma` to write the standalone
    ``sam2_hiera_large.pt`` flavor)."""
    out: Dict[str, Any] = {}
    export_hiera(params["image_encoder_trunk"], cfg, out)
    for i in range(len(cfg.fpn_backbone_channels)):
        _inv_conv2d(
            params["image_encoder_neck"][f"convs_{i}"],
            f"image_encoder.neck.convs.{i}.conv", out,
        )

    pe = params["sam_prompt_encoder"]
    out["sam_prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = (
        _t(pe["pe_layer"]["positional_encoding_gaussian_matrix"])
    )
    out["sam_prompt_encoder.not_a_point_embed.weight"] = _t(
        _f32(pe["not_a_point_embed"])[None]
    )
    out["sam_prompt_encoder.no_mask_embed.weight"] = _t(
        _f32(pe["no_mask_embed"])[None]
    )
    for i in range(4):
        out[f"sam_prompt_encoder.point_embeddings.{i}.weight"] = _t(
            _f32(pe[f"point_embeddings_{i}"])[None]
        )
    # the dense-mask downscaler is created lazily (traced only when a mask
    # prompt is given; the [SEG] pipeline never passes one) — export it when
    # present, skip otherwise
    if "mask_downscaling_0" in pe:
        for i in (0, 3, 6):
            _inv_conv2d(
                pe[f"mask_downscaling_{i}"],
                f"sam_prompt_encoder.mask_downscaling.{i}", out,
            )
        for i in (1, 4):
            _inv_layernorm(
                pe[f"mask_downscaling_{i}"],
                f"sam_prompt_encoder.mask_downscaling.{i}", out,
            )

    md = params["sam_mask_decoder"]
    out["sam_mask_decoder.obj_score_token.weight"] = _t(md["obj_score_token"])
    out["sam_mask_decoder.iou_token.weight"] = _t(md["iou_token"])
    out["sam_mask_decoder.mask_tokens.weight"] = _t(md["mask_tokens"])
    tr = md["transformer"]
    for i in (0, 1):
        bp = f"sam_mask_decoder.transformer.layers.{i}"
        blk = tr[f"layers_{i}"]
        _inv_attn(blk["self_attn"], f"{bp}.self_attn", out)
        _inv_attn(
            blk["cross_attn_token_to_image"], f"{bp}.cross_attn_token_to_image",
            out,
        )
        _inv_attn(
            blk["cross_attn_image_to_token"], f"{bp}.cross_attn_image_to_token",
            out,
        )
        _inv_mlp(blk["mlp"], f"{bp}.mlp", 2, out)
        for n in ("norm1", "norm2", "norm3", "norm4"):
            _inv_layernorm(blk[n], f"{bp}.{n}", out)
    _inv_attn(
        tr["final_attn_token_to_image"],
        "sam_mask_decoder.transformer.final_attn_token_to_image", out,
    )
    _inv_layernorm(
        tr["norm_final_attn"],
        "sam_mask_decoder.transformer.norm_final_attn", out,
    )
    _inv_deconv(md["output_upscaling_0"], "sam_mask_decoder.output_upscaling.0", out)
    _inv_layernorm(md["output_upscaling_1"], "sam_mask_decoder.output_upscaling.1", out)
    _inv_deconv(md["output_upscaling_3"], "sam_mask_decoder.output_upscaling.3", out)
    _inv_mlp(
        md["iou_prediction_head"], "sam_mask_decoder.iou_prediction_head",
        cfg.iou_head_depth, out,
    )
    _inv_mlp(md["pred_obj_score_head"], "sam_mask_decoder.pred_obj_score_head", 3, out)
    for i in range(cfg.num_multimask_outputs + 1):
        _inv_mlp(
            md[f"output_hypernetworks_mlps_{i}"],
            f"sam_mask_decoder.output_hypernetworks_mlps.{i}", 3, out,
        )

    ma = params["memory_attention"]
    _inv_layernorm(ma["norm"], "memory_attention.norm", out)
    for i in range(cfg.mem_attn_layers):
        lp = f"memory_attention.layers.{i}"
        blk = ma[f"layers_{i}"]
        _inv_attn(blk["self_attn"], f"{lp}.self_attn", out)
        _inv_attn(blk["cross_attn_image"], f"{lp}.cross_attn_image", out)
        _inv_linear(blk["linear1"], f"{lp}.linear1", out)
        _inv_linear(blk["linear2"], f"{lp}.linear2", out)
        for n in ("norm1", "norm2", "norm3"):
            _inv_layernorm(blk[n], f"{lp}.{n}", out)

    me = params["memory_encoder"]
    _inv_conv2d(me["pix_feat_proj"], "memory_encoder.pix_feat_proj", out)
    _inv_conv2d(me["out_proj"], "memory_encoder.out_proj", out)
    for i in range(4):
        _inv_conv2d(
            me["mask_downsampler"][f"encoder_{3 * i}"],
            f"memory_encoder.mask_downsampler.encoder.{3 * i}", out,
        )
        _inv_layernorm(
            me["mask_downsampler"][f"encoder_{3 * i + 1}"],
            f"memory_encoder.mask_downsampler.encoder.{3 * i + 1}", out,
        )
    _inv_conv2d(
        me["mask_downsampler"]["encoder_12"],
        "memory_encoder.mask_downsampler.encoder.12", out,
    )
    for i in range(2):
        fp = f"memory_encoder.fuser.layers.{i}"
        blk = me[f"fuser_layers_{i}"]
        _inv_conv2d(blk["dwconv"], f"{fp}.dwconv", out)
        _inv_layernorm(blk["norm"], f"{fp}.norm", out)
        _inv_linear(blk["pwconv1"], f"{fp}.pwconv1", out)
        _inv_linear(blk["pwconv2"], f"{fp}.pwconv2", out)
        out[f"{fp}.g_weight"] = _t(blk["g_weight"])

    _inv_conv2d(params["conv_s0"], "sam_mask_decoder.conv_s0", out)
    _inv_conv2d(params["conv_s1"], "sam_mask_decoder.conv_s1", out)
    _inv_mlp(params["obj_ptr_proj"], "obj_ptr_proj", 3, out)
    for n in ("no_mem_embed", "no_mem_pos_enc", "maskmem_tpos_enc", "no_obj_ptr"):
        out[n] = _t(params[n])
    return out


def rename_g_weight_to_gamma(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Module-space → standalone ``sam2_hiera_large.pt`` key space (the
    inverse of the reference's load-time rename, sam2.py:30-85)."""
    return {k.replace(".g_weight", ".gamma"): v for k, v in sd.items()}


# --------------------------------------------------------------------------
# Composite + file writers
# --------------------------------------------------------------------------

def export_full_checkpoint(params: Dict, cfg: UFVideoConfig) -> Dict[str, Any]:
    """Composite params → the reference's full SFT state dict layout
    (inverse of checkpoints.convert_full_checkpoint): LLM at top level,
    tower under ``model.vision_tower.vision_tower.``, projector under
    ``model.mm_projector.``, region encoder / text_hidden_fcs / SAM2 under
    their ``model.…`` module paths."""
    out = export_qwen2(params["llm"], cfg.llm)
    for k, v in export_siglip(params["vision"], cfg.vision).items():
        out[f"model.vision_tower.vision_tower.{k}"] = v
    for k, v in export_projector(params["projector"], cfg.projector).items():
        out[f"model.mm_projector.{k}"] = v
    for k, v in export_region_encoder(params["region"]).items():
        out[f"model.region_encoder.{k}"] = v
    for k, v in export_text_hidden_fcs(params["text_fcs"]).items():
        out[f"model.{k}"] = v
    if "sam" in params:
        for k, v in export_sam2(params["sam"], cfg.sam).items():
            out[f"model.mask_encoder.sam2_model.{k}"] = v
    return out


def save_hf_checkpoint(
    path: str,
    params: Dict,
    cfg: UFVideoConfig,
    *,
    dtype: str = "bfloat16",
    extra_config: Optional[Dict[str, Any]] = None,
) -> None:
    """Write a reference-loadable checkpoint directory: single
    ``pytorch_model.bin`` + a ``config.json`` carrying the fields the
    reference loader reads off the config bus (model/__init__.py:67-70,
    train.py:873-912)."""
    import json

    import torch

    os.makedirs(path, exist_ok=True)
    sd = export_full_checkpoint(params, cfg)
    torch_dtype = getattr(torch, dtype)
    sd = {k: v.to(torch_dtype) if v.is_floating_point() else v
          for k, v in sd.items()}
    torch.save(sd, os.path.join(path, "pytorch_model.bin"))
    config = {
        "architectures": ["VideoReferQwen2ForCausalLM"],
        "model_type": "videorefer_qwen2",
        "hidden_size": cfg.llm.hidden_size,
        "intermediate_size": cfg.llm.intermediate_size,
        "num_attention_heads": cfg.llm.num_heads,
        "num_key_value_heads": cfg.llm.num_kv_heads,
        "num_hidden_layers": cfg.llm.num_layers,
        "vocab_size": cfg.llm.vocab_size,
        "rms_norm_eps": cfg.llm.rms_norm_eps,
        "rope_theta": cfg.llm.rope_theta,
        "max_position_embeddings": cfg.llm.max_position_embeddings,
        "tie_word_embeddings": cfg.llm.tie_word_embeddings,
        "torch_dtype": dtype,
        # reference config-bus fields
        "mm_projector_type": cfg.projector.projector_type,
        "mm_vision_select_layer": cfg.vision.select_layer,
        "region_encoder_type": "onefusion",
        "num_frames": cfg.budget.num_frames,
        "seg_token_id": cfg.seg_token_id,
        "train_mask_decoder": False,
        "sam_out_dim": cfg.sam_out_dim,
        "ce_loss_weight": cfg.ce_loss_weight,
        "bce_loss_weight": cfg.bce_loss_weight,
        "dice_loss_weight": cfg.dice_loss_weight,
    }
    config.update(extra_config or {})
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f, indent=2)


def save_adapter_bins(path: str, params: Dict, cfg: UFVideoConfig) -> None:
    """Write the reference's adapter-only artifacts
    (videorefer_trainer.py:343-385): ``mm_projector.bin`` and
    ``region_encoder.bin`` with full module-path keys, the format
    ``load_mm_projector`` (projector.py:49-63) consumes."""
    import torch

    os.makedirs(path, exist_ok=True)
    if "projector" in params:
        sd = {
            f"model.mm_projector.{k}": v
            for k, v in export_projector(
                params["projector"], cfg.projector
            ).items()
        }
        torch.save(sd, os.path.join(path, "mm_projector.bin"))
    if "region" in params:
        sd = {
            f"model.region_encoder.{k}": v
            for k, v in export_region_encoder(params["region"]).items()
        }
        torch.save(sd, os.path.join(path, "region_encoder.bin"))
