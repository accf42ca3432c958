"""Checkpoint IO: full-checkpoint conversion, LoRA merge, orbax round trip."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ufvideo_tpu.checkpoints import (
    convert_region_encoder,
    convert_text_hidden_fcs,
    load_sam2_checkpoint,
    merge_lora,
)
from ufvideo_tpu.mm_utils import create_photo_grid, trim_at_stop_strings


def test_merge_lora():
    w = torch.randn(8, 8)
    sd = {"model.layers.0.self_attn.q_proj.weight": w.clone()}
    a = torch.randn(2, 8)
    b = torch.randn(8, 2)
    adapter = {
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": a,
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": b,
        "base_model.model.model.mm_projector.readout.0.weight": torch.ones(3, 3),
    }
    merged = merge_lora(sd, adapter, alpha=4, r=2)
    want = w + 2.0 * (b @ a)
    np.testing.assert_allclose(
        merged["model.layers.0.self_attn.q_proj.weight"].numpy(),
        want.numpy(), atol=1e-5,
    )
    # non-LoRA trainables injected
    assert "model.mm_projector.readout.0.weight" in merged


def test_sam2_checkpoint_fixups(tmp_path):
    sd = {"model.image_encoder.trunk.blocks.0.gamma": torch.ones(4)}
    p = tmp_path / "sam.pt"
    torch.save({"model": sd}, p)
    out = load_sam2_checkpoint(str(p))
    assert "image_encoder.trunk.blocks.0.g_weight" in out


def test_adapter_converters():
    sd = {
        "feat_linear.0.weight": torch.randn(6, 4),
        "feat_linear.0.bias": torch.randn(6),
        "feat_linear.2.weight": torch.randn(6, 6),
        "feat_linear.2.bias": torch.randn(6),
    }
    p = convert_region_encoder(sd)
    assert p["fc0"]["kernel"].shape == (4, 6)
    sd2 = {
        "text_hidden_fcs.0.0.weight": torch.randn(4, 4),
        "text_hidden_fcs.0.0.bias": torch.randn(4),
        "text_hidden_fcs.0.2.weight": torch.randn(2, 4),
        "text_hidden_fcs.0.2.bias": torch.randn(2),
    }
    t = convert_text_hidden_fcs(sd2)
    assert t["fc1"]["kernel"].shape == (4, 2)


def test_photo_grid_and_stop_trim():
    frames = np.arange(4 * 2 * 3 * 3, dtype=np.uint8).reshape(4, 2, 3, 3)
    grid = create_photo_grid(frames, 2, 2)
    assert grid.shape == (4, 6, 3)
    np.testing.assert_array_equal(grid[:2, :3], frames[0])
    np.testing.assert_array_equal(grid[2:, 3:], frames[3])

    assert trim_at_stop_strings("hello<|im_end|>junk", ["<|im_end|>"]) == "hello"
    assert trim_at_stop_strings("clean", ["<|im_end|>"]) == "clean"
