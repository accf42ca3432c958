"""Full-checkpoint conversion: synthesize a reference-shaped torch state
dict (tiny dims, reference key naming) and load it through
convert_full_checkpoint into a working composite model."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded by -m 'not slow'

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ufvideo_tpu.checkpoints import convert_full_checkpoint, infer_vocab_size
from ufvideo_tpu.configs import tiny_config
from ufvideo_tpu.models.ufvideo import UFVideoModel


def _t(*shape):
    return torch.randn(*shape) * 0.02


def build_reference_style_sd(cfg):
    """State dict with the reference's key layout (videorefer_qwen2 +
    vision_tower.vision_tower + mm_projector + region_encoder +
    text_hidden_fcs; SAM2 omitted — it ships separately,
    model/__init__.py:68-70)."""
    sd = {}
    L = cfg.llm
    sd["model.embed_tokens.weight"] = _t(L.vocab_size, L.hidden_size)
    sd["lm_head.weight"] = _t(L.vocab_size, L.hidden_size)
    sd["model.norm.weight"] = torch.ones(L.hidden_size)
    for i in range(L.num_layers):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = torch.ones(L.hidden_size)
        sd[f"{p}.post_attention_layernorm.weight"] = torch.ones(L.hidden_size)
        for name, od in (
            ("q_proj", L.num_heads * L.head_dim),
            ("k_proj", L.num_kv_heads * L.head_dim),
            ("v_proj", L.num_kv_heads * L.head_dim),
        ):
            sd[f"{p}.self_attn.{name}.weight"] = _t(od, L.hidden_size)
            sd[f"{p}.self_attn.{name}.bias"] = _t(od)
        sd[f"{p}.self_attn.o_proj.weight"] = _t(
            L.hidden_size, L.num_heads * L.head_dim
        )
        sd[f"{p}.mlp.gate_proj.weight"] = _t(L.intermediate_size, L.hidden_size)
        sd[f"{p}.mlp.up_proj.weight"] = _t(L.intermediate_size, L.hidden_size)
        sd[f"{p}.mlp.down_proj.weight"] = _t(L.hidden_size, L.intermediate_size)

    V = cfg.vision
    vp = "model.vision_tower.vision_tower.vision_model"
    sd[f"{vp}.embeddings.patch_embedding.weight"] = _t(
        V.hidden_size, 3, V.patch_size, V.patch_size
    )
    sd[f"{vp}.embeddings.patch_embedding.bias"] = _t(V.hidden_size)
    sd[f"{vp}.embeddings.position_embedding.weight"] = _t(
        V.num_patches, V.hidden_size
    )
    for i in range(V.num_layers):
        p = f"{vp}.encoder.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            sd[f"{p}.{ln}.weight"] = torch.ones(V.hidden_size)
            sd[f"{p}.{ln}.bias"] = torch.zeros(V.hidden_size)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{p}.self_attn.{proj}.weight"] = _t(V.hidden_size, V.hidden_size)
            sd[f"{p}.self_attn.{proj}.bias"] = _t(V.hidden_size)
        sd[f"{p}.mlp.fc1.weight"] = _t(V.intermediate_size, V.hidden_size)
        sd[f"{p}.mlp.fc1.bias"] = _t(V.intermediate_size)
        sd[f"{p}.mlp.fc2.weight"] = _t(V.hidden_size, V.intermediate_size)
        sd[f"{p}.mlp.fc2.bias"] = _t(V.hidden_size)

    # STC projector (timm RegStage naming, projector.py:133-238)
    P = cfg.projector
    mp = "model.mm_projector"
    for stage, in_ch in (("s1", P.encoder_hidden_size), ("s2", P.hidden_size)):
        ch = P.hidden_size
        for b in range(1, P.depth + 1):
            bp = f"{mp}.{stage}.b{b}"
            cin = in_ch if b == 1 else ch
            rd = int(round(cin * 0.25))
            sd[f"{bp}.conv1.conv.weight"] = _t(ch, cin, 1, 1)
            sd[f"{bp}.conv1.bn.weight"] = torch.ones(ch)
            sd[f"{bp}.conv1.bn.bias"] = torch.zeros(ch)
            sd[f"{bp}.conv2.conv.weight"] = _t(ch, 1, 3, 3)
            sd[f"{bp}.conv2.bn.weight"] = torch.ones(ch)
            sd[f"{bp}.conv2.bn.bias"] = torch.zeros(ch)
            sd[f"{bp}.se.fc1.weight"] = _t(rd, ch, 1, 1)
            sd[f"{bp}.se.fc1.bias"] = _t(rd)
            sd[f"{bp}.se.fc2.weight"] = _t(ch, rd, 1, 1)
            sd[f"{bp}.se.fc2.bias"] = _t(ch)
            sd[f"{bp}.conv3.conv.weight"] = _t(ch, ch, 1, 1)
            sd[f"{bp}.conv3.bn.weight"] = torch.ones(ch)
            sd[f"{bp}.conv3.bn.bias"] = torch.zeros(ch)
            if cin != ch:
                sd[f"{bp}.downsample.conv.weight"] = _t(ch, cin, 1, 1)
                sd[f"{bp}.downsample.bn.weight"] = torch.ones(ch)
                sd[f"{bp}.downsample.bn.bias"] = torch.zeros(ch)
    sd[f"{mp}.sampler.0.weight"] = _t(P.hidden_size, P.hidden_size, 2, 2, 2)
    sd[f"{mp}.sampler.0.bias"] = _t(P.hidden_size)
    sd[f"{mp}.readout.0.weight"] = _t(P.hidden_size, P.hidden_size)
    sd[f"{mp}.readout.0.bias"] = _t(P.hidden_size)
    sd[f"{mp}.readout.2.weight"] = _t(P.hidden_size, P.hidden_size)
    sd[f"{mp}.readout.2.bias"] = _t(P.hidden_size)

    R = cfg.region
    sd["model.region_encoder.feat_linear.0.weight"] = _t(
        R.hidden_size, R.encoder_hidden_size
    )
    sd["model.region_encoder.feat_linear.0.bias"] = _t(R.hidden_size)
    sd["model.region_encoder.feat_linear.2.weight"] = _t(
        R.hidden_size, R.hidden_size
    )
    sd["model.region_encoder.feat_linear.2.bias"] = _t(R.hidden_size)

    sd["model.text_hidden_fcs.0.0.weight"] = _t(L.hidden_size, L.hidden_size)
    sd["model.text_hidden_fcs.0.0.bias"] = _t(L.hidden_size)
    sd["model.text_hidden_fcs.0.2.weight"] = _t(cfg.sam_out_dim, L.hidden_size)
    sd["model.text_hidden_fcs.0.2.bias"] = _t(cfg.sam_out_dim)
    return sd


def test_convert_full_checkpoint_roundtrip():
    cfg = tiny_config()
    torch.manual_seed(0)
    sd = build_reference_style_sd(cfg)
    assert infer_vocab_size(sd) == cfg.llm.vocab_size

    params = convert_full_checkpoint(sd, cfg)
    assert set(params) >= {"llm", "vision", "projector", "region", "text_fcs"}

    # converted tree must drive the composite model end to end
    model = UFVideoModel(cfg)
    init = model.init_params(jax.random.PRNGKey(0))
    params["sam"] = None  # SAM ships separately
    for key in ("llm", "vision", "projector", "region", "text_fcs"):
        ref_shapes = jax.tree.map(lambda x: x.shape, init[key])
        got_shapes = jax.tree.map(lambda x: tuple(np.asarray(x).shape), params[key])
        assert ref_shapes == got_shapes, key

    pix = np.random.RandomState(0).randn(
        1, cfg.budget.num_frames, cfg.vision.image_size, cfg.vision.image_size, 3
    ).astype(np.float32)
    feats = model.encode_video(
        {k: v for k, v in params.items() if k != "sam"}, jnp.asarray(pix)
    )
    assert feats.shape == (1, cfg.num_video_tokens, cfg.llm.hidden_size)
    assert bool(jnp.all(jnp.isfinite(feats.astype(jnp.float32))))