"""SAM2 video propagation: end-to-end parity against the reference
SAM2VideoPredictor (torch oracle, tiny config, CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/ufvideo/model/sam2.py"
pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference oracle not mounted"
)

from ufvideo_tpu.models.sam2 import convert as C
from ufvideo_tpu.models.sam2.model import SAM2
from ufvideo_tpu.models.sam2.video import (
    encode_video_frames,
    masks_to_video_res,
    propagate_video,
)
import dataclasses

from test_sam2_parity import TINY as _TINY

# SAM2Base hard-codes iou_head_hidden_dim=256 in _build_sam_heads
# (sam2.py:2565-2585), so the oracle predictor must match it
TINY = dataclasses.replace(_TINY, iou_head_hidden_dim=256)


def load_ref_module():
    import importlib.util

    import torch

    spec = importlib.util.spec_from_file_location("ref_sam2_video", REF)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    # CPU shim: the reference hard-codes .cuda() moves (sam2.py:3556,2913)
    torch.Tensor.cuda = lambda self, *a, **kw: self
    return ref


def build_predictor(ref, **overrides):
    """Construct the tiny-config reference SAM2VideoPredictor with seeded
    weights; overrides forward extra builder kwargs (e.g.
    memory_temporal_stride_for_eval)."""
    import torch

    torch.manual_seed(0)
    h = TINY.hiera
    trunk = ref.Hiera(
        embed_dim=h.embed_dim, num_heads=h.num_heads, stages=h.stages,
        global_att_blocks=h.global_att_blocks, window_spec=h.window_spec,
        window_pos_embed_bkg_spatial_size=h.window_pos_embed_bkg_spatial_size,
    )
    neck = ref.FpnNeck(
        position_encoding=ref.PositionEmbeddingSine(num_pos_feats=TINY.fpn_dim),
        d_model=TINY.fpn_dim,
        backbone_channel_list=list(TINY.fpn_backbone_channels),
        fpn_top_down_levels=list(TINY.fpn_top_down_levels),
        fpn_interp_model="nearest",
    )
    image_encoder = ref.ImageEncoder(scalp=1, trunk=trunk, neck=neck)

    def rope(**kw):
        return ref.RoPEAttention(
            rope_theta=10000.0, feat_sizes=[8, 8],
            embedding_dim=TINY.mem_attn_dim, num_heads=1, downsample_rate=1,
            dropout=0.0, **kw,
        )

    layer = ref.MemoryAttentionLayer(
        activation="relu", dim_feedforward=TINY.mem_attn_dff, dropout=0.0,
        pos_enc_at_attn=False, d_model=TINY.mem_attn_dim,
        pos_enc_at_cross_attn_queries=False, pos_enc_at_cross_attn_keys=True,
        self_attention=rope(),
        cross_attention=rope(rope_k_repeat=True, kv_in_dim=TINY.mem_dim),
    )
    memory_attention = ref.MemoryAttention(
        d_model=TINY.mem_attn_dim, pos_enc_at_input=True,
        num_layers=TINY.mem_attn_layers, layer=layer,
    )
    memory_encoder = ref.MemoryEncoder(
        out_dim=TINY.mem_dim,
        position_encoding=ref.PositionEmbeddingSine(num_pos_feats=TINY.mem_dim),
        mask_downsampler=ref.MaskDownSampler(
            embed_dim=TINY.sam_embed_dim, kernel_size=3, stride=2, padding=1
        ),
        fuser=ref.Fuser(
            ref.CXBlock(dim=TINY.sam_embed_dim, kernel_size=7, padding=3,
                        layer_scale_init_value=1e-6, use_dwconv=True),
            num_layers=2,
        ),
        in_dim=TINY.sam_embed_dim,
    )
    predictor = ref.SAM2VideoPredictor(
        image_encoder=image_encoder,
        memory_attention=memory_attention,
        memory_encoder=memory_encoder,
        num_maskmem=TINY.num_maskmem,
        image_size=TINY.hiera.image_size,
        sigmoid_scale_for_mem_enc=20.0,
        sigmoid_bias_for_mem_enc=-10.0,
        use_mask_input_as_output_without_sam=True,
        directly_add_no_mem_embed=True,
        use_high_res_features_in_sam=True,
        multimask_output_in_sam=True,
        iou_prediction_use_sigmoid=True,
        use_obj_ptrs_in_encoder=True,
        add_tpos_enc_to_obj_ptrs=False,
        only_obj_ptrs_in_the_past_for_eval=True,
        pred_obj_scores=True,
        pred_obj_scores_mlp=True,
        fixed_no_obj_ptr=True,
        multimask_output_for_tracking=True,
        use_multimask_token_for_obj_ptr=True,
        multimask_min_pt_num=0,
        multimask_max_pt_num=1,
        use_mlp_for_obj_ptr_proj=True,
        sam_mask_decoder_extra_args={
            "dynamic_multimask_via_stability": True,
            "dynamic_multimask_stability_delta": 0.05,
            "dynamic_multimask_stability_thresh": 0.98,
        },
        **overrides,
    ).eval()
    return predictor


@pytest.fixture(scope="module")
def oracle():
    ref = load_ref_module()
    return ref, build_predictor(ref)


def test_video_propagation_parity(oracle):
    import torch

    ref, predictor = oracle
    # tiny decoder arg: iou head hidden dim differs from default builder
    sd = predictor.state_dict()
    params = C.convert_sam2(sd, TINY)
    model = SAM2(TINY)

    t, n_obj = 5, 2
    rng = np.random.RandomState(0)
    video = rng.randn(t, 128, 128, 3).astype(np.float32)
    lang = rng.randn(n_obj, 1, TINY.sam_embed_dim).astype(np.float32)

    # ---- reference path (language_embd_inference body, fp32) ----
    with torch.no_grad():
        state = predictor.init_state(torch.from_numpy(video.transpose(0, 3, 1, 2)))
        state["device"] = torch.device("cpu")
        state["storage_device"] = torch.device("cpu")
        for obj in range(n_obj):
            emb = torch.from_numpy(lang[obj])[None]  # [1, 1, C]
            predictor.add_language_embd(state, 0, obj + 100, emb, inference=True)
        ref_masks = []
        for fi, ids, logits in predictor.propagate_in_video(state):
            ref_masks.append(logits.numpy())
    ref_masks = np.stack(ref_masks)  # [T, B, 1, 128, 128]

    # ---- TPU-native path ----
    feats = encode_video_frames(model, params, jnp.asarray(video), chunk=4)
    low = propagate_video(model, params, feats, jnp.asarray(lang))
    got = np.asarray(
        jax.image.resize(
            low.astype(jnp.float32), (t, n_obj, 1, 128, 128), "bilinear"
        )
    )

    assert got.shape == ref_masks.shape
    # propagation accumulates rounding across frames; compare logits loosely
    # and the thresholded masks exactly
    np.testing.assert_allclose(got, ref_masks, atol=5e-2, rtol=5e-2)
    np.testing.assert_array_equal(got > 0, ref_masks > 0)


def test_video_propagation_long_ring_eviction(oracle):
    """10 frames > 6 non-cond memory slots: exercises ring-buffer eviction
    and the obj-ptr window sliding past the start (sam2.py:2874-2975)."""
    import torch

    ref, predictor = oracle
    sd = predictor.state_dict()
    params = C.convert_sam2(sd, TINY)
    model = SAM2(TINY)

    t, n_obj = 10, 1
    rng = np.random.RandomState(7)
    video = rng.randn(t, 128, 128, 3).astype(np.float32)
    lang = rng.randn(n_obj, 1, TINY.sam_embed_dim).astype(np.float32)

    with torch.no_grad():
        state = predictor.init_state(torch.from_numpy(video.transpose(0, 3, 1, 2)))
        state["device"] = torch.device("cpu")
        state["storage_device"] = torch.device("cpu")
        for obj in range(n_obj):
            predictor.add_language_embd(
                state, 0, obj + 100, torch.from_numpy(lang[obj])[None],
                inference=True,
            )
        ref_masks = [
            logits.numpy() for _, _, logits in predictor.propagate_in_video(state)
        ]
    ref_masks = np.stack(ref_masks)

    feats = encode_video_frames(model, params, jnp.asarray(video), chunk=4)
    low = propagate_video(model, params, feats, jnp.asarray(lang))
    got = np.asarray(
        jax.image.resize(
            low.astype(jnp.float32), (t, n_obj, 1, 128, 128), "bilinear"
        )
    )
    np.testing.assert_array_equal(got > 0, ref_masks > 0)
    np.testing.assert_allclose(got, ref_masks, atol=8e-2, rtol=8e-2)


def test_masks_to_video_res_shape():
    masks = jnp.zeros((3, 2, 1, 32, 32))
    out = masks_to_video_res(masks, 77, 55)
    assert out.shape == (3, 2, 77, 55)
    assert out.dtype == bool


@pytest.mark.slow
def test_batched_multivideo_propagation_matches_loop():
    """propagate_videos_batched(V videos) == per-video propagate_video."""
    from ufvideo_tpu.models.sam2.video import propagate_videos_batched

    model = SAM2(TINY, dtype=jnp.float32, param_dtype=jnp.float32)
    img = TINY.hiera.image_size
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3), jnp.float32)
    )["params"]
    v, t = 3, 4
    frames = 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (v * t, img, img, 3), jnp.float32
    )
    feats = encode_video_frames(model, params, frames, chunk=v * t)
    embd = 0.1 * jax.random.normal(
        jax.random.PRNGKey(2), (v, 1, TINY.sam_embed_dim), jnp.float32
    )

    singles = []
    for i in range(v):
        f_i = feats.map_frames(lambda a: a[i * t : (i + 1) * t])
        singles.append(
            np.asarray(propagate_video(model, params, f_i, embd[i][:, None]))
        )
    want = np.stack(singles, axis=1)[:, :, 0]  # [T, V, 1, h, w]

    f_b = feats.map_frames(lambda a: a.reshape(v, t, *a.shape[1:]))
    got = np.asarray(propagate_videos_batched(model, params, f_b, embd))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
