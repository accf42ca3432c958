"""General SAM2 video predictor (stride / reverse / mid-video / point-box
conditioning): parity against the reference SAM2VideoPredictor and the
reference track_step loop (torch oracle, tiny config, CPU)."""

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
    FrameCondition,
    encode_video_frames,
    propagate_video,
    propagate_video_general,
)

from test_sam2_video import TINY, build_predictor, load_ref_module


@pytest.fixture(scope="module")
def ref_mod():
    return load_ref_module()


def _jax_model(predictor):
    params = C.convert_sam2(predictor.state_dict(), TINY)
    return SAM2(TINY), params


def _upsample(low, size=128):
    t, b = low.shape[:2]
    return np.asarray(
        jax.image.resize(low.astype(jnp.float32), (t, b, 1, size, size), "bilinear")
    )


def _ref_language_masks(predictor, video, lang, frame_idx=0, reverse=False):
    """Reference propagate_in_video after add_language_embd on `frame_idx`,
    on a fresh state (one direction per state — matches the self-contained
    per-direction semantics of propagate_video_general)."""
    import torch

    with torch.no_grad():
        state = predictor.init_state(
            torch.from_numpy(video.transpose(0, 3, 1, 2))
        )
        state["device"] = torch.device("cpu")
        state["storage_device"] = torch.device("cpu")
        for obj in range(lang.shape[0]):
            predictor.add_language_embd(
                state, frame_idx, obj + 100,
                torch.from_numpy(lang[obj])[None], inference=True,
            )
        out = {}
        for fi, _, logits in predictor.propagate_in_video(
            state, start_frame_idx=frame_idx, reverse=reverse
        ):
            out[fi] = logits.numpy()
    return out  # {frame_idx: [B, 1, H, W]}


def test_general_reduces_to_specialized():
    """stride=1, one language cond on frame 0, forward — must match the
    UFVideo fast path bit-for-bit (same ops modulo the ring gather)."""
    model = SAM2(TINY, dtype=jnp.float32, param_dtype=jnp.float32)
    img = TINY.hiera.image_size
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3), jnp.float32)
    )["params"]
    t, b = 5, 2
    frames = 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (t, img, img, 3), jnp.float32
    )
    feats = encode_video_frames(model, params, frames, chunk=t)
    lang = 0.1 * jax.random.normal(
        jax.random.PRNGKey(2), (b, 1, TINY.sam_embed_dim), jnp.float32
    )

    want = np.asarray(propagate_video(model, params, feats, lang))
    got = np.asarray(
        propagate_video_general(
            model, params, feats, [FrameCondition(0, language_embd=lang)],
            direction="forward",
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_temporal_stride_parity(ref_mod):
    """memory_temporal_stride_for_eval=2 over 10 frames: the strided
    non-cond memory selection (sam2.py:2874-2898) must match."""
    predictor = build_predictor(ref_mod, memory_temporal_stride_for_eval=2)
    model, params = _jax_model(predictor)

    t, n_obj = 10, 1
    rng = np.random.RandomState(3)
    video = rng.randn(t, 128, 128, 3).astype(np.float32)
    lang = rng.randn(n_obj, 1, TINY.sam_embed_dim).astype(np.float32)

    ref_out = _ref_language_masks(predictor, video, lang)
    ref_masks = np.stack([ref_out[fi] for fi in range(t)])

    feats = encode_video_frames(model, params, jnp.asarray(video), chunk=4)
    low = propagate_video_general(
        model, params, feats,
        [FrameCondition(0, language_embd=jnp.asarray(lang))],
        stride=2, direction="forward",
    )
    got = _upsample(low)
    np.testing.assert_array_equal(got > 0, ref_masks > 0)
    np.testing.assert_allclose(got, ref_masks, atol=8e-2, rtol=8e-2)


def test_midvideo_reverse_parity(ref_mod):
    """Conditioning on frame 3 of 7, tracking both directions
    (propagate_in_video start_frame_idx / reverse, sam2.py:4092-4109)."""
    predictor = build_predictor(ref_mod)
    model, params = _jax_model(predictor)

    t, n_obj, anchor = 7, 2, 3
    rng = np.random.RandomState(4)
    video = rng.randn(t, 128, 128, 3).astype(np.float32)
    lang = rng.randn(n_obj, 1, TINY.sam_embed_dim).astype(np.float32)

    fwd = _ref_language_masks(predictor, video, lang, frame_idx=anchor)
    rev = _ref_language_masks(
        predictor, video, lang, frame_idx=anchor, reverse=True
    )
    ref_masks = np.stack(
        [rev[fi] for fi in range(anchor)] + [fwd[fi] for fi in range(anchor, t)]
    )

    feats = encode_video_frames(model, params, jnp.asarray(video), chunk=4)
    low = propagate_video_general(
        model, params, feats,
        [FrameCondition(anchor, language_embd=jnp.asarray(lang))],
        direction="both",
    )
    got = _upsample(low)
    np.testing.assert_array_equal(got > 0, ref_masks > 0)
    np.testing.assert_allclose(got, ref_masks, atol=8e-2, rtol=8e-2)


def test_point_prompt_parity(ref_mod):
    """Click-conditioned tracking vs a manual reference track_step loop
    (track_step with point_inputs, sam2.py:3174-3273)."""
    import torch

    predictor = build_predictor(ref_mod)
    model, params = _jax_model(predictor)

    t, n_obj = 5, 2
    rng = np.random.RandomState(5)
    video = rng.randn(t, 128, 128, 3).astype(np.float32)
    coords = np.array([[[40.0, 60.0]], [[90.0, 30.0]]], np.float32)  # [B,1,2]
    labels = np.ones((n_obj, 1), np.int32)

    with torch.no_grad():
        state = predictor.init_state(
            torch.from_numpy(video.transpose(0, 3, 1, 2))
        )
        state["cached_features"] = {}
        output_dict = {"cond_frame_outputs": {}, "non_cond_frame_outputs": {}}
        ref_masks = []
        for fi in range(t):
            _, _, cvf, cvp, fs = predictor._get_image_feature(state, fi, n_obj)
            is_init = fi == 0
            point_inputs = (
                {
                    "point_coords": torch.from_numpy(coords),
                    "point_labels": torch.from_numpy(labels),
                }
                if is_init
                else None
            )
            out = predictor.track_step(
                fi, is_init, cvf, cvp, fs, point_inputs, None, output_dict, t
            )
            key = "cond_frame_outputs" if is_init else "non_cond_frame_outputs"
            output_dict[key][fi] = out
            # track_step returns low-res [B, 1, h4, w4] logits
            ref_masks.append(out["pred_masks"].numpy())
    ref_masks = np.stack(ref_masks)

    feats = encode_video_frames(model, params, jnp.asarray(video), chunk=4)
    low = propagate_video_general(
        model, params, feats,
        [
            FrameCondition(
                0,
                point_coords=jnp.asarray(coords),
                point_labels=jnp.asarray(labels),
            )
        ],
        direction="forward",
    )
    got = np.asarray(low)
    np.testing.assert_array_equal(got > 0, ref_masks > 0)
    np.testing.assert_allclose(got, ref_masks, atol=8e-2, rtol=8e-2)


def test_multi_cond_frames_parity(ref_mod):
    """Language conditioning on frames 0 AND 2: both cond memories attend
    (t_pos=0), the cond frame is skipped in the non-cond ring walk, and the
    propagation yields stored cond outputs on prompted frames."""
    predictor = build_predictor(ref_mod)
    model, params = _jax_model(predictor)

    import torch

    t, n_obj = 6, 1
    rng = np.random.RandomState(6)
    video = rng.randn(t, 128, 128, 3).astype(np.float32)
    lang = rng.randn(2, n_obj, 1, TINY.sam_embed_dim).astype(np.float32)

    with torch.no_grad():
        state = predictor.init_state(
            torch.from_numpy(video.transpose(0, 3, 1, 2))
        )
        state["device"] = torch.device("cpu")
        state["storage_device"] = torch.device("cpu")
        for ci, emb in zip((0, 2), lang):
            for obj in range(n_obj):
                predictor.add_language_embd(
                    state, ci, obj + 100, torch.from_numpy(emb[obj])[None],
                    inference=True,
                )
        out = {
            fi: logits.numpy()
            for fi, _, logits in predictor.propagate_in_video(state)
        }
    ref_masks = np.stack([out[fi] for fi in range(t)])

    feats = encode_video_frames(model, params, jnp.asarray(video), chunk=4)
    low = propagate_video_general(
        model, params, feats,
        [
            FrameCondition(0, language_embd=jnp.asarray(lang[0])),
            FrameCondition(2, language_embd=jnp.asarray(lang[1])),
        ],
        direction="forward",
    )
    got = _upsample(low)
    np.testing.assert_array_equal(got > 0, ref_masks > 0)
    np.testing.assert_allclose(got, ref_masks, atol=8e-2, rtol=8e-2)


def test_box_equals_corner_points():
    """A box condition is exactly two corner points with labels 2/3."""
    model = SAM2(TINY, dtype=jnp.float32, param_dtype=jnp.float32)
    img = TINY.hiera.image_size
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3), jnp.float32)
    )["params"]
    t = 3
    frames = 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (t, img, img, 3), jnp.float32
    )
    feats = encode_video_frames(model, params, frames, chunk=t)
    box = jnp.asarray([[20.0, 30.0, 90.0, 110.0]])

    via_box = propagate_video_general(
        model, params, feats, [FrameCondition(0, box=box)], direction="forward"
    )
    via_pts = propagate_video_general(
        model, params, feats,
        [
            FrameCondition(
                0,
                point_coords=jnp.asarray([[[20.0, 30.0], [90.0, 110.0]]]),
                point_labels=jnp.asarray([[2, 3]], jnp.int32),
            )
        ],
        direction="forward",
    )
    np.testing.assert_allclose(
        np.asarray(via_box), np.asarray(via_pts), atol=0, rtol=0
    )
    assert np.isfinite(np.asarray(via_box)).all()
