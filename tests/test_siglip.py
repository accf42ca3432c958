"""SigLIP tower: numerical parity against HF SiglipVisionModel (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ufvideo_tpu.configs import SiglipVisionConfig
from ufvideo_tpu.models.siglip import SiglipVisionTower
from ufvideo_tpu.weights import convert_siglip

TINY = SiglipVisionConfig(
    hidden_size=32, intermediate_size=64, num_layers=3, num_heads=2,
    image_size=56, patch_size=14,
)


def _hf_tiny():
    torch = pytest.importorskip("torch")
    from transformers import SiglipVisionConfig as HFCfg, SiglipVisionModel

    hf_cfg = HFCfg(
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        image_size=TINY.image_size,
        patch_size=TINY.patch_size,
        hidden_act="gelu_pytorch_tanh",
    )
    torch.manual_seed(0)
    model = SiglipVisionModel(hf_cfg).eval()
    return torch, model


def test_siglip_matches_hf():
    torch, hf = _hf_tiny()
    params = convert_siglip(hf.state_dict(), TINY)

    rng = np.random.RandomState(0)
    pixels = rng.randn(2, 56, 56, 3).astype(np.float32)

    with torch.no_grad():
        hf_out = hf(
            torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
            output_hidden_states=True,
        )
    # reference feature tap: hidden_states[-2] (encoder.py:126-132)
    ref = hf_out.hidden_states[-2].numpy()

    model = SiglipVisionTower(TINY, dtype=jnp.float32, param_dtype=jnp.float32)
    out = model.apply({"params": params}, jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_siglip_init_and_shape():
    model = SiglipVisionTower(TINY, dtype=jnp.float32, param_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)))[
        "params"
    ]
    out = model.apply({"params": params}, jnp.zeros((3, 56, 56, 3)))
    assert out.shape == (3, TINY.num_patches, TINY.hidden_size)
    # scan-stacked layer params
    assert params["layers"]["mlp"]["fc1"]["kernel"].shape[0] == TINY.num_encode_layers


def test_siglip_int8_w8a8_close_to_fp32():
    """W8A8 tower on quantized params tracks the fp32 tower: the encoders
    are where int8 raises the MXU ceiling (PERF.md), and this bounds the
    numeric cost. Per-token activation scales + per-column weight scales
    keep features within ~1% cosine of fp32 on random inputs."""
    from ufvideo_tpu.quant import quantize_vision_params

    model = SiglipVisionTower(TINY, dtype=jnp.float32, param_dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    px = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3), jnp.float32)
    params = model.init(rng, px)["params"]
    ref = np.asarray(model.apply({"params": params}, px), np.float32)

    qparams = quantize_vision_params(params)
    qmodel = SiglipVisionTower(
        TINY, dtype=jnp.float32, param_dtype=jnp.float32, quant=True
    )
    out = np.asarray(qmodel.apply({"params": qparams}, px), np.float32)

    assert out.shape == ref.shape
    a = out.reshape(-1, TINY.hidden_size)
    b = ref.reshape(-1, TINY.hidden_size)
    cos = np.sum(a * b, -1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9
    )
    assert float(cos.min()) > 0.99, float(cos.min())
    rel = np.linalg.norm(a - b) / np.linalg.norm(b)
    assert rel < 0.05, rel
