"""Projector: static output shapes and variant coverage."""

import jax
import jax.numpy as jnp
import pytest

from ufvideo_tpu.configs import ProjectorConfig
from ufvideo_tpu.models.projector import build_projector


def _run(ptype, t=4, grid=4, enc=16, hid=32):
    cfg = ProjectorConfig(
        projector_type=ptype, encoder_hidden_size=enc, hidden_size=hid,
        depth=2, mlp_depth=2,
    )
    model = build_projector(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, t, grid * grid, enc))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    out = model.apply({"params": params}, x)
    return cfg, out


@pytest.mark.parametrize(
    "ptype",
    [
        "linear", "mlp2x_gelu", "stc_connector", "stc_connector_v35",
        "stp_connector", "spatial_conv", "spatial_pool",
    ],
)
def test_projector_shapes(ptype):
    cfg, out = _run(ptype)
    assert out.shape[0] == 2 and out.shape[2] == cfg.hidden_size
    # static token-count formula must agree with the actual output
    if ptype in ("linear", "mlp2x_gelu"):
        assert out.shape[1] == 16
    else:
        assert out.shape[1] == cfg.num_video_tokens(4, 4)


def test_v35_full_scale_token_count():
    """Flagship config: 32 frames x 27x27 SigLIP grid -> 16x13x13 tokens."""
    cfg = ProjectorConfig()
    assert cfg.token_grid(32, 27) == (16, 13, 13)
    assert cfg.num_video_tokens(32, 27) == 2704


def test_stc_pad1_token_count():
    cfg = ProjectorConfig(projector_type="stc_connector")
    # pad=1: (32+2-2)//2+1 = 17, (27+2-2)//2+1 = 14
    assert cfg.token_grid(32, 27) == (17, 14, 14)
