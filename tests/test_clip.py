"""CLIP tower parity vs HF CLIPVisionModel (tiny config) + hole filling."""

import jax.numpy as jnp
import numpy as np
import pytest

from ufvideo_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower
from ufvideo_tpu.weights import convert_clip

TINY = CLIPVisionConfig(
    hidden_size=32, intermediate_size=64, num_layers=3, num_heads=2,
    image_size=56, patch_size=14,
)


def test_clip_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModel

    hf_cfg = HFCfg(
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        image_size=TINY.image_size,
        patch_size=TINY.patch_size,
        hidden_act="quick_gelu",
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()
    params = convert_clip(hf.state_dict(), TINY)

    rng = np.random.RandomState(0)
    pixels = rng.randn(2, 56, 56, 3).astype(np.float32)
    with torch.no_grad():
        out = hf(
            torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
            output_hidden_states=True,
        )
    # reference tap: hidden_states[-2] then strip CLS (encoder.py:36-44)
    ref = out.hidden_states[-2][:, 1:].numpy()

    model = CLIPVisionTower(TINY, dtype=jnp.float32, param_dtype=jnp.float32)
    got = model.apply({"params": params}, jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-4)


def test_fill_holes():
    from ufvideo_tpu.models.sam2.post import fill_holes_in_mask_scores

    m = np.full((16, 16), 1.0, np.float32)
    m[5:7, 5:7] = -1.0  # 4-px hole
    m[10:16, 10:16] = -4.0  # 36-px region, stays
    out = fill_holes_in_mask_scores(m, max_area=8)
    assert (out[5:7, 5:7] == 0.1).all()
    assert (out[10:16, 10:16] == -4.0).all()
    # disabled by default
    np.testing.assert_array_equal(fill_holes_in_mask_scores(m, 0), m)
