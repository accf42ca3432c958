"""HF-format checkpoint EXPORT: the exact inverse of the converters.

convert(export(params)) must round-trip to identical params, and
export(convert(sd)) must reproduce the reference-layout state dict key for
key — so a model trained here is loadable by the reference stack
(videorefer_trainer.py:93-146 format, model/__init__.py:39-133 loader).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from test_full_checkpoint import build_reference_style_sd
from ufvideo_tpu.checkpoints import (
    convert_full_checkpoint,
    load_adapter_weights,
    load_torch_state_dict,
    convert_region_encoder,
)
from ufvideo_tpu.configs import tiny_config
from ufvideo_tpu.export import (
    export_full_checkpoint,
    export_sam2,
    rename_g_weight_to_gamma,
    save_adapter_bins,
    save_hf_checkpoint,
)
from ufvideo_tpu.models.sam2.convert import convert_sam2
from ufvideo_tpu.weights import convert_stc_projector


def _assert_tree_close(a, b, atol=1e-6, path=""):
    assert set(a) == set(b), (path, set(a) ^ set(b))
    for k in a:
        if isinstance(a[k], dict):
            _assert_tree_close(a[k], b[k], atol, f"{path}/{k}")
        else:
            np.testing.assert_allclose(
                np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
                atol=atol, err_msg=f"{path}/{k}",
            )


def test_export_reproduces_reference_sd():
    """Reference-layout sd → convert → export: identical key set, identical
    values (the format the reference's from_pretrained expects)."""
    cfg = tiny_config()
    torch.manual_seed(0)
    sd = build_reference_style_sd(cfg)
    params = convert_full_checkpoint(sd, cfg)
    out = export_full_checkpoint(params, cfg)
    # the only keys export cannot produce are the vision layers BEYOND the
    # feature tap (convert never reads them; the reference never executes
    # them either — encoder.py:126-132 taps hidden_states[-2])
    tap = cfg.vision.num_encode_layers
    dropped = {
        k for k in sd
        if ".vision_model.encoder.layers." in k
        and int(k.split(".encoder.layers.")[1].split(".")[0]) >= tap
    }
    assert set(out) == set(sd) - dropped, (set(out) ^ (set(sd) - dropped))
    for k in out:
        np.testing.assert_allclose(
            out[k].float().numpy(), sd[k].float().numpy(), atol=1e-6,
            err_msg=k,
        )


def test_export_sam2_roundtrip():
    """SAM2 params → export (module key space) → convert: identity; and the
    .gamma flavor re-loads through the reference's load-time rename."""
    from ufvideo_tpu.models.sam2 import SAM2

    cfg = tiny_config().sam
    model = SAM2(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.hiera.image_size, cfg.hiera.image_size, 3)),
    )["params"]
    params = jax.tree_util.tree_map(np.asarray, dict(params))
    # the dense-mask downscaler is lazily created (the [SEG] path never
    # traces it) — inject it so the FULL reference key set round-trips
    rng = np.random.RandomState(0)
    c = cfg.sam_embed_dim
    params["sam_prompt_encoder"] = dict(params["sam_prompt_encoder"])
    params["sam_prompt_encoder"].update({
        "mask_downscaling_0": {"kernel": rng.randn(2, 2, 1, 4).astype("f"),
                               "bias": rng.randn(4).astype("f")},
        "mask_downscaling_1": {"scale": np.ones(4, "f"),
                               "bias": np.zeros(4, "f")},
        "mask_downscaling_3": {"kernel": rng.randn(2, 2, 4, 16).astype("f"),
                               "bias": rng.randn(16).astype("f")},
        "mask_downscaling_4": {"scale": np.ones(16, "f"),
                               "bias": np.zeros(16, "f")},
        "mask_downscaling_6": {"kernel": rng.randn(1, 1, 16, c).astype("f"),
                               "bias": rng.randn(c).astype("f")},
    })
    sd = export_sam2(params, cfg)
    back = convert_sam2(sd, cfg)
    _assert_tree_close(back, jax.tree.map(np.asarray, params))

    # standalone .pt flavor: .g_weight → .gamma, then the reference's
    # load-time rename (checkpoints.load_sam2_checkpoint) restores it
    pt = rename_g_weight_to_gamma(sd)
    assert any(".gamma" in k for k in pt)
    assert not any(".g_weight" in k for k in pt)
    restored = {
        k.replace(".gamma", ".g_weight"): v for k, v in pt.items()
    }
    back2 = convert_sam2(restored, cfg)
    _assert_tree_close(back2, jax.tree.map(np.asarray, params))


def test_save_hf_checkpoint_roundtrip(tmp_path):
    """save_hf_checkpoint output loads through this framework's own
    reference-checkpoint loader (the same code path real reference
    checkpoints take) and round-trips the params."""
    cfg = tiny_config()
    torch.manual_seed(1)
    sd = build_reference_style_sd(cfg)
    params = convert_full_checkpoint(sd, cfg)
    out_dir = tmp_path / "export"
    save_hf_checkpoint(str(out_dir), params, cfg, dtype="float32")
    assert (out_dir / "config.json").exists()
    sd2 = load_torch_state_dict(str(out_dir / "pytorch_model.bin"))
    params2 = convert_full_checkpoint(sd2, cfg)
    _assert_tree_close(
        jax.tree.map(np.asarray, params2), jax.tree.map(np.asarray, params),
        atol=1e-6,
    )


def test_save_adapter_bins_roundtrip(tmp_path):
    cfg = tiny_config()
    torch.manual_seed(2)
    sd = build_reference_style_sd(cfg)
    params = convert_full_checkpoint(sd, cfg)
    save_adapter_bins(str(tmp_path), params, cfg)

    proj_sd = load_adapter_weights(str(tmp_path / "mm_projector.bin"))
    proj = convert_stc_projector(
        proj_sd, depth=cfg.projector.depth, mlp_depth=cfg.projector.mlp_depth
    )
    _assert_tree_close(proj, jax.tree.map(np.asarray, params["projector"]))

    reg_sd = load_adapter_weights(str(tmp_path / "region_encoder.bin"))
    reg = convert_region_encoder(reg_sd)
    _assert_tree_close(reg, jax.tree.map(np.asarray, params["region"]))


def test_linear_projector_export_roundtrip(tmp_path):
    """'mlp2x_gelu' projectors must export/load too (the reference trainer
    writes mm_projector.bin for every projector type) — export→convert
    round-trips to identical params via the Sequential 0/2/... key layout."""
    import jax.numpy as jnp

    from ufvideo_tpu.export import export_projector
    from ufvideo_tpu.models.projector import build_projector
    from ufvideo_tpu.weights import convert_projector

    import dataclasses

    cfg = tiny_config()
    pcfg = dataclasses.replace(cfg.projector, projector_type="mlp2x_gelu")
    proj = build_projector(pcfg, dtype=jnp.float32, param_dtype=jnp.float32)
    params = proj.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 4, pcfg.encoder_hidden_size), jnp.float32),
    )["params"]

    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in export_projector(params, pcfg).items()}
    assert set(sd) == {"0.weight", "0.bias", "2.weight", "2.bias"}
    back = convert_projector(sd, pcfg)
    _assert_tree_close(back, jax.tree.map(np.asarray, params))
