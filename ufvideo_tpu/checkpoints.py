"""Checkpoint IO: reference torch artifacts → params, and native orbax.

Covers the reference's three artifact flavors (SURVEY §5):
  1. full model checkpoints (HF dir with .bin/.safetensors shards),
  2. adapter-only ``mm_projector.bin`` / ``region_encoder.bin``
     (videorefer_trainer.py:343-385),
  3. the separate SAM2 ``sam2_hiera_large.pt`` with the ``.gamma →
     .g_weight`` rename (sam2.py:30-85),
plus orbax save/restore for native TPU training state.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import numpy as np

from .configs import UFVideoConfig
from .models.sam2.convert import convert_sam2
from .weights import (
    _linear,
    convert_qwen2,
    convert_siglip,
    convert_projector,
)


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a torch state dict from a file or an HF checkpoint directory
    (sharded .bin or .safetensors)."""
    import torch

    if os.path.isfile(path):
        if path.endswith(".safetensors"):
            from safetensors.torch import load_file

            return load_file(path)
        sd = torch.load(path, map_location="cpu", weights_only=True)
        return sd.get("model", sd) if isinstance(sd, dict) else sd

    files = sorted(os.listdir(path))
    shards = [f for f in files if f.endswith(".safetensors")]
    if shards:
        from safetensors.torch import load_file

        out: Dict[str, Any] = {}
        for f in shards:
            out.update(load_file(os.path.join(path, f)))
        return out
    shards = [
        f for f in files
        if f.startswith("pytorch_model") and f.endswith(".bin")
    ]
    out = {}
    for f in shards:
        out.update(
            torch.load(os.path.join(path, f), map_location="cpu", weights_only=True)
        )
    if not out:
        raise FileNotFoundError(f"no checkpoint shards found in {path}")
    return out


def load_sam2_checkpoint(path: str) -> Dict[str, Any]:
    """sam2_hiera_large.pt loader with the reference's key fixups
    (sam2.py:30-85: strip 'model.' prefix, '.gamma' → '.g_weight')."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("model.")
        k = k.replace(".gamma", ".g_weight")
        out[k] = v
    return out


def _strip(sd: Mapping, prefix: str) -> Dict[str, Any]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_region_encoder(sd: Mapping) -> Dict[str, Any]:
    """region_encoder.feat_linear Sequential(Linear, GELU, Linear)
    (layer.py:54-59) → RegionProjector fc0/fc2."""
    return {
        "fc0": _linear(sd, "feat_linear.0"),
        "fc2": _linear(sd, "feat_linear.2"),
    }


def convert_text_hidden_fcs(sd: Mapping) -> Dict[str, Any]:
    """text_hidden_fcs.0 Sequential(Linear, ReLU, Linear, Dropout)
    (videorefer_arch.py:140-146) → TextHiddenFC fc0/fc1."""
    return {
        "fc0": _linear(sd, "text_hidden_fcs.0.0"),
        "fc1": _linear(sd, "text_hidden_fcs.0.2"),
    }


def convert_full_checkpoint(
    sd: Mapping,
    cfg: UFVideoConfig,
    sam_sd: Optional[Mapping] = None,
) -> Dict[str, Any]:
    """Full reference checkpoint state dict → composite params.

    ``sam_sd``: separate SAM2 checkpoint; if None, SAM2 weights are taken
    from the full checkpoint's ``model.mask_encoder.sam2_model.`` keys
    (present in SFT checkpoints; the base SAM2 ships separately,
    model/__init__.py:68-70).
    """
    params: Dict[str, Any] = {
        "llm": convert_qwen2(sd, cfg.llm),
        "vision": convert_siglip(
            _strip(sd, "model.vision_tower.vision_tower."), cfg.vision
        ),
        "projector": convert_projector(
            _strip(sd, "model.mm_projector."), cfg.projector
        ),
        "region": convert_region_encoder(_strip(sd, "model.region_encoder.")),
        "text_fcs": convert_text_hidden_fcs(_strip(sd, "model.")),
    }
    if sam_sd is None and any(
        k.startswith("model.mask_encoder.sam2_model.") for k in sd
    ):
        sam_sd = _strip(sd, "model.mask_encoder.sam2_model.")
    if sam_sd is not None:
        params["sam"] = convert_sam2(sam_sd, cfg.sam)
    return params


def load_adapter_weights(path: str) -> Dict[str, Any]:
    """mm_projector.bin / region_encoder.bin adapter loader
    (reference: projector.py:49-63 load_mm_projector); strips the module
    prefix so the converters apply directly."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    out = {}
    for k, v in sd.items():
        for prefix in ("model.mm_projector.", "mm_projector.",
                       "model.region_encoder.", "region_encoder."):
            if k.startswith(prefix):
                k = k[len(prefix):]
                break
        out[k] = v
    return out


def convert_base_plus_adapters(
    base_sd: Mapping,
    cfg: UFVideoConfig,
    projector_path: Optional[str] = None,
    region_path: Optional[str] = None,
    sam_sd: Optional[Mapping] = None,
) -> Dict[str, Any]:
    """The reference's pretrain loading path (model/__init__.py:107-123):
    base LLM checkpoint + separately-saved adapter weights."""
    params = convert_full_checkpoint(base_sd, cfg, sam_sd)
    if projector_path:
        params["projector"] = convert_projector(
            load_adapter_weights(projector_path), cfg.projector
        )
    if region_path:
        params["region"] = convert_region_encoder(
            load_adapter_weights(region_path)
        )
    return params


def infer_vocab_size(sd: Mapping) -> int:
    return int(sd["model.embed_tokens.weight"].shape[0])


def merge_lora(
    sd: Dict[str, Any],
    adapter_sd: Mapping,
    *,
    alpha: float,
    r: Optional[int] = None,
) -> Dict[str, Any]:
    """Merge PEFT LoRA adapters into the base state dict in place
    (reference: model/__init__.py:82-106 loads adapter_model +
    non_lora_trainables and merge_and_unload()s).

    Adapter keys look like
    ``base_model.model.<path>.lora_A.weight`` / ``.lora_B.weight``;
    merged weight = W + (alpha / r) * B @ A. ``alpha`` is required — PEFT
    checkpoints carry it in adapter_config.json (use
    :func:`merge_lora_from_dir`), and defaulting it to r would silently
    rescale the adapter (the reference trains alpha=16, r=8 → scale 2.0,
    reference train.py:152-154).
    """
    lora_a = {
        k.replace(".lora_A.weight", ""): v
        for k, v in adapter_sd.items()
        if k.endswith(".lora_A.weight")
    }
    for base_key, a in lora_a.items():
        b = adapter_sd[base_key + ".lora_B.weight"]
        target = base_key.removeprefix("base_model.model.") + ".weight"
        if target not in sd:
            continue
        rr = r or a.shape[0]
        scale = alpha / rr
        w = sd[target].float()
        sd[target] = (w + scale * (b.float() @ a.float())).to(sd[target].dtype)
    # non-LoRA trainables (projector/region/text_fcs) override base entries
    for k, v in adapter_sd.items():
        if ".lora_" in k:
            continue
        kk = k.removeprefix("base_model.model.")
        sd[kk] = v
    return sd


def merge_lora_from_dir(sd: Dict[str, Any], adapter_dir: str) -> Dict[str, Any]:
    """Merge a PEFT adapter directory: reads lora_alpha/r from
    adapter_config.json (reference model/__init__.py:63-81 via PeftModel)
    plus adapter_model + non_lora_trainables weights."""
    import json

    with open(os.path.join(adapter_dir, "adapter_config.json")) as f:
        acfg = json.load(f)
    adapter_sd = dict(_load_torch_sd(
        _first_existing(adapter_dir, ("adapter_model.safetensors",
                                      "adapter_model.bin"))
    ))
    non_lora = _first_existing(
        adapter_dir, ("non_lora_trainables.bin", "non_lora_trainables.safetensors"),
        required=False,
    )
    if non_lora:
        adapter_sd.update(_load_torch_sd(non_lora))
    return merge_lora(
        sd, adapter_sd, alpha=float(acfg["lora_alpha"]), r=int(acfg["r"])
    )


def _load_torch_sd(path: str) -> Dict[str, Any]:
    if path.endswith(".safetensors"):
        from safetensors.torch import load_file

        return load_file(path)
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)


def _first_existing(d: str, names, required: bool = True) -> Optional[str]:
    for n in names:
        p = os.path.join(d, n)
        if os.path.exists(p):
            return p
    if required:
        raise FileNotFoundError(f"none of {names} in {d}")
    return None


# --------------------------------------------------------------------------
# native orbax checkpoints (train state / converted params)
# --------------------------------------------------------------------------

def save_params(path: str, params: Any) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params, force=True)


def load_params(path: str, template: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(os.path.abspath(path), template)
        return ckptr.restore(os.path.abspath(path))


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Auto-resume discovery (reference: train.py:953-956 looks for
    checkpoint-*)."""
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [
        d for d in os.listdir(ckpt_dir)
        if d.startswith("checkpoint-") and d.split("-")[-1].isdigit()
    ]
    if not cands:
        return None
    best = max(cands, key=lambda d: int(d.split("-")[-1]))
    return os.path.join(ckpt_dir, best)
