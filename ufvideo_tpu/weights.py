"""Checkpoint translation: torch state dicts → JAX param pytrees.

The reference ships three torch artifact flavors (SURVEY §5): full HF
checkpoints, adapter-only ``mm_projector.bin``/``region_encoder.bin``
(videorefer_trainer.py:343-385), and a separate SAM2 ``.pt`` with the
``.gamma → .g_weight`` rename (sam2.py:30-85). These converters map each into
this framework's flax param trees. Layer-stacked (nn.scan) modules are
assembled by stacking the per-layer torch tensors along a leading axis.

torch is used host-side only (CPU), purely as a checkpoint reader.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping

import numpy as np

from .configs import Qwen2Config, SiglipVisionConfig


def _np(t) -> np.ndarray:
    """torch tensor (any dtype incl. bf16) → numpy float32."""
    import torch

    if isinstance(t, np.ndarray):
        return t
    t = t.detach().cpu()
    if t.dtype in (torch.bfloat16, torch.float16):
        t = t.float()
    return t.numpy()


def _linear(sd: Mapping, prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _rmsnorm(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"])}


def _conv2d(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    # torch [out, in, kh, kw] → flax [kh, kw, in, out]
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _stack_layers(n: int, fn: Callable[[int], Any]) -> Any:
    """Stack per-layer param subtrees along a new leading axis (nn.scan)."""
    import jax

    trees = [fn(i) for i in range(n)]
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *trees)


# --------------------------------------------------------------------------
# SigLIP vision tower (HF SiglipVisionModel state dict)
# --------------------------------------------------------------------------

def convert_siglip(sd: Mapping, cfg: SiglipVisionConfig) -> Dict[str, Any]:
    """HF SiglipVisionModel → SiglipVisionTower params.

    Only the layers the feature tap executes are kept (the reference also
    never runs the final layer/post-LN, encoder.py:126-132).
    """
    p = "vision_model"

    def layer(i: int) -> Dict[str, Any]:
        lp = f"{p}.encoder.layers.{i}"
        return {
            "layer_norm1": _layernorm(sd, f"{lp}.layer_norm1"),
            "layer_norm2": _layernorm(sd, f"{lp}.layer_norm2"),
            "self_attn": {
                # q/k/v packed into one fused projection (models/siglip.py)
                "qkv_proj": {
                    "kernel": np.concatenate(
                        [
                            _np(sd[f"{lp}.self_attn.{n}.weight"]).T
                            for n in ("q_proj", "k_proj", "v_proj")
                        ],
                        axis=1,
                    ),
                    "bias": np.concatenate(
                        [
                            _np(sd[f"{lp}.self_attn.{n}.bias"])
                            for n in ("q_proj", "k_proj", "v_proj")
                        ]
                    ),
                },
                "out_proj": _linear(sd, f"{lp}.self_attn.out_proj"),
            },
            "mlp": {
                "fc1": _linear(sd, f"{lp}.mlp.fc1"),
                "fc2": _linear(sd, f"{lp}.mlp.fc2"),
            },
        }

    pe = _conv2d(sd, f"{p}.embeddings.patch_embedding")
    return {
        # patchify runs as reshape+matmul; kernel kept in conv layout
        "patch_embedding_kernel": pe["kernel"],
        "patch_embedding_bias": pe["bias"],
        "position_embedding": _np(sd[f"{p}.embeddings.position_embedding.weight"]),
        "layers": _stack_layers(cfg.num_encode_layers, layer),
    }


def convert_clip(sd: Mapping, cfg) -> Dict[str, Any]:
    """HF CLIPVisionModel → CLIPVisionTower params (reference alternative
    tower, encoder.py:12-93). Only layers up to the feature tap are kept."""
    p = "vision_model"

    def layer(i: int) -> Dict[str, Any]:
        lp = f"{p}.encoder.layers.{i}"
        return {
            "layer_norm1": _layernorm(sd, f"{lp}.layer_norm1"),
            "layer_norm2": _layernorm(sd, f"{lp}.layer_norm2"),
            "q_proj": _linear(sd, f"{lp}.self_attn.q_proj"),
            "k_proj": _linear(sd, f"{lp}.self_attn.k_proj"),
            "v_proj": _linear(sd, f"{lp}.self_attn.v_proj"),
            "out_proj": _linear(sd, f"{lp}.self_attn.out_proj"),
            "fc1": _linear(sd, f"{lp}.mlp.fc1"),
            "fc2": _linear(sd, f"{lp}.mlp.fc2"),
        }

    return {
        "patch_embedding_kernel": _np(
            sd[f"{p}.embeddings.patch_embedding.weight"]
        ).transpose(2, 3, 1, 0),
        "class_embedding": _np(sd[f"{p}.embeddings.class_embedding"]),
        "position_embedding": _np(
            sd[f"{p}.embeddings.position_embedding.weight"]
        ),
        "pre_layrnorm": _layernorm(sd, f"{p}.pre_layrnorm"),
        "layers": _stack_layers(cfg.num_encode_layers, layer),
    }


# --------------------------------------------------------------------------
# Qwen2 LLM (HF Qwen2ForCausalLM state dict)
# --------------------------------------------------------------------------

def convert_qwen2(sd: Mapping, cfg: Qwen2Config) -> Dict[str, Any]:
    """HF Qwen2ForCausalLM → Qwen2LM params (vocab padded to MXU multiple)."""
    def pad_vocab(x: np.ndarray) -> np.ndarray:
        pad = cfg.padded_vocab_size - x.shape[0]
        if pad > 0:
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
        return x

    def layer(i: int) -> Dict[str, Any]:
        lp = f"model.layers.{i}"
        qkv_kernel = np.concatenate(
            [
                _np(sd[f"{lp}.self_attn.{n}.weight"]).T
                for n in ("q_proj", "k_proj", "v_proj")
            ],
            axis=1,
        )
        qkv_bias = np.concatenate(
            [
                _np(sd[f"{lp}.self_attn.{n}.bias"])
                for n in ("q_proj", "k_proj", "v_proj")
            ]
        )
        return {
            "input_layernorm": _rmsnorm(sd, f"{lp}.input_layernorm"),
            "post_attention_layernorm": _rmsnorm(
                sd, f"{lp}.post_attention_layernorm"
            ),
            "self_attn_qkv_proj": {"kernel": qkv_kernel, "bias": qkv_bias},
            "self_attn_o_proj": _linear(sd, f"{lp}.self_attn.o_proj", bias=False),
            "mlp_gate_proj": _linear(sd, f"{lp}.mlp.gate_proj", bias=False),
            "mlp_up_proj": _linear(sd, f"{lp}.mlp.up_proj", bias=False),
            "mlp_down_proj": _linear(sd, f"{lp}.mlp.down_proj", bias=False),
        }

    embed = pad_vocab(_np(sd["model.embed_tokens.weight"]))
    params: Dict[str, Any] = {
        "embed_tokens": {"embedding": embed},
        "layers": _stack_layers(cfg.num_layers, layer),
        "norm": _rmsnorm(sd, "model.norm"),
    }
    if cfg.tie_word_embeddings or "lm_head.weight" not in sd:
        params["lm_head"] = {"kernel": embed.T.copy()}
    else:
        params["lm_head"] = {"kernel": pad_vocab(_np(sd["lm_head.weight"])).T}
    return params


# --------------------------------------------------------------------------
# STC projector (reference mm_projector.bin; timm RegStage naming)
# --------------------------------------------------------------------------

def _conv3d(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    # torch [out, in, kt, kh, kw] → flax [kt, kh, kw, in, out]
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 4, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _reg_block(sd: Mapping, p: str, has_downsample: bool) -> Dict[str, Any]:
    out = {
        "conv1": _conv2d(sd, f"{p}.conv1.conv"),
        "conv1_ln": _layernorm(sd, f"{p}.conv1.bn"),
        "conv2": _conv2d(sd, f"{p}.conv2.conv"),
        "conv2_ln": _layernorm(sd, f"{p}.conv2.bn"),
        "se_fc1": _conv2d(sd, f"{p}.se.fc1"),
        "se_fc2": _conv2d(sd, f"{p}.se.fc2"),
        "conv3": _conv2d(sd, f"{p}.conv3.conv"),
        "conv3_ln": _layernorm(sd, f"{p}.conv3.bn"),
    }
    if has_downsample:
        out["downsample"] = _conv2d(sd, f"{p}.downsample.conv")
        out["downsample_ln"] = _layernorm(sd, f"{p}.downsample.bn")
    return out


def convert_stc_projector(sd: Mapping, depth: int = 4, mlp_depth: int = 2) -> Dict[str, Any]:
    """Reference mm_projector state dict (STCConnector*, projector.py:133-238)
    → STCConnector params. Keys may be prefixed 'mm_projector.'."""
    sd = {k.removeprefix("mm_projector."): v for k, v in sd.items()}
    params: Dict[str, Any] = {}
    for stage in ("s1", "s2"):
        params[stage] = {
            f"b{i + 1}": _reg_block(
                sd, f"{stage}.b{i + 1}",
                has_downsample=f"{stage}.b{i + 1}.downsample.conv.weight" in sd,
            )
            for i in range(depth)
        }
    params["sampler"] = _conv3d(sd, "sampler.0")
    params["readout"] = {
        f"fc{2 * i}": _linear(sd, f"readout.{2 * i}") for i in range(mlp_depth)
    }
    return params


def convert_linear_projector(sd: Mapping) -> Dict[str, Any]:
    """'linear'/'mlpNx_gelu' mm_projector (reference nn.Sequential indices
    0, 2, 4, …; odd slots are parameter-free GELUs) → LinearProjector
    params (fc0, fc2, …)."""
    sd = {k.removeprefix("mm_projector."): v for k, v in sd.items()}
    idxs = sorted(
        {
            int(k.split(".")[0])
            for k in sd
            if k.split(".")[0].isdigit() and k.endswith(".weight")
        }
    )
    return {f"fc{i}": _linear(sd, str(i)) for i in idxs}


def convert_projector(sd: Mapping, pcfg) -> Dict[str, Any]:
    """Route on projector_type (counterpart of export.export_projector)."""
    import re as _re

    t = pcfg.projector_type
    if t == "linear" or _re.match(r"^mlp(\d+)x_gelu$", t):
        return convert_linear_projector(sd)
    return convert_stc_projector(
        sd, depth=pcfg.depth, mlp_depth=pcfg.mlp_depth
    )


def cast_tree(tree: Any, dtype) -> Any:
    import jax
    import jax.numpy as jnp

    return jax.tree.map(lambda x: jnp.asarray(x, dtype=dtype), tree)
