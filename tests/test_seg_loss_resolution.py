"""Bound the collator's fixed-512² loss-grid deviation.

The reference computes the mask loss at the label's native resolution
(videorefer_qwen2.py:299-305); our static-shape collator resamples gt masks
to a fixed 512² grid (train/data.py Collator.loss_mask_size) so the pjit'd
seg step keeps one compiled shape. This test quantifies the deviation: for
DAVIS/YouTube-VOS-like resolutions and realistic blob masks + imperfect
predictions, the 512²-grid dice+BCE must track the native-resolution loss
to within a few percent — bounding the training-signal distortion the
PARITY.md note documents.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ufvideo_tpu.train.losses import combined_mask_loss


def _blob_mask(rng, h, w, n_blobs=3):
    yy, xx = np.mgrid[0:h, 0:w]
    m = np.zeros((h, w), bool)
    for _ in range(n_blobs):
        cy, cx = rng.uniform(0.2, 0.8) * h, rng.uniform(0.2, 0.8) * w
        ry, rx = rng.uniform(0.05, 0.25) * h, rng.uniform(0.05, 0.25) * w
        m |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1
    return m.astype(np.float32)


def _resize(m, size):
    import cv2

    return cv2.resize(m, (size, size), interpolation=cv2.INTER_NEAREST)


@pytest.mark.parametrize("h,w", [(480, 854), (720, 1280), (360, 640)])
def test_fixed_grid_loss_tracks_native(h, w):
    rng = np.random.default_rng(0)
    rels = []
    for trial in range(6):
        gt = _blob_mask(rng, h, w)
        # an imperfect prediction: shifted/dilated logits of the gt
        shift = rng.integers(-12, 12, size=2)
        pred_mask = np.roll(gt, shift, axis=(0, 1))
        logits = (pred_mask * 2 - 1) * rng.uniform(2.0, 6.0)
        logits += rng.normal(0, 0.5, logits.shape)

        valid = jnp.ones((1,), bool)

        def total(lg, g):
            bce, dce = combined_mask_loss(
                jnp.asarray(lg)[None], jnp.asarray(g)[None], valid
            )
            return float(bce + dce)

        native = total(logits, gt)
        g512 = total(
            _resize(logits.astype(np.float32), 512), _resize(gt, 512)
        )
        rels.append(abs(g512 - native) / max(abs(native), 1e-6))
    # the fixed grid perturbs the per-sample loss by only a few percent
    assert np.mean(rels) < 0.04, rels
    assert np.max(rels) < 0.10, rels


def test_collator_native_grid_exact_roundtrip():
    """A batch whose labels share a native resolution computes the loss grid
    AT that resolution — gt passes through bit-exact (no resample), which is
    the reference's native-resolution loss (videorefer_qwen2.py:299-305)."""
    import numpy as np

    from ufvideo_tpu.configs import tiny_config
    from ufvideo_tpu.train.data import Collator, TrainSample

    cfg = tiny_config()
    rng = np.random.RandomState(0)
    v = cfg.vision.image_size
    ss = cfg.sam.hiera.image_size
    ts = cfg.budget.num_frames_sam

    def sample(h, w):
        return TrainSample(
            input_ids=[5, -201, 7], labels=[-100, -100, 7],
            video=rng.randn(cfg.budget.num_frames, v, v, 3).astype(np.float32),
            images_sam=rng.randn(ts, ss, ss, 3).astype(np.float32),
            gt_masks=(rng.rand(1, ts, h, w) > 0.5).astype(np.float32),
        )

    col = Collator(cfg, -300, -301)
    s = sample(48, 72)
    batch = col([s, s])
    assert batch["gt_masks"].shape[-2:] == (48, 72)
    np.testing.assert_array_equal(batch["gt_masks"][0, 0, :, :48, :72],
                                  s.gt_masks[0])

    # registered grids are capped; an overflow resolution reuses the closest
    for i, (h, w) in enumerate([(30, 40), (60, 90), (100, 100), (20, 20),
                                (80, 50)]):
        col([sample(h, w)] * 2)
    assert len(col._grids) <= col.native_loss_grids
    over = col([sample(47, 71)] * 2)  # not registered: falls to (48, 72)
    assert tuple(over["gt_masks"].shape[-2:]) in [tuple(g) for g in col._grids]

    # native_loss_grids=0 restores the fixed square grid
    fixed = Collator(cfg, -300, -301, loss_mask_size=32, native_loss_grids=0)
    b = fixed([sample(40, 60)] * 2)
    assert b["gt_masks"].shape[-2:] == (32, 32)


def test_collator_caps_huge_native_resolution():
    import numpy as np

    from ufvideo_tpu.configs import tiny_config
    from ufvideo_tpu.train.data import Collator, TrainSample

    cfg = tiny_config()
    rng = np.random.RandomState(1)
    v = cfg.vision.image_size
    ss = cfg.sam.hiera.image_size
    ts = cfg.budget.num_frames_sam
    s = TrainSample(
        input_ids=[5, -201, 7], labels=[-100, -100, 7],
        video=rng.randn(cfg.budget.num_frames, v, v, 3).astype(np.float32),
        images_sam=rng.randn(ts, ss, ss, 3).astype(np.float32),
        gt_masks=(rng.rand(1, ts, 1080, 1920) > 0.5).astype(np.float32),
    )
    col = Collator(cfg, -300, -301, max_loss_side=1024)
    batch = col([s])
    gh, gw = batch["gt_masks"].shape[-2:]
    assert max(gh, gw) <= 1024
    assert abs(gh / gw - 1080 / 1920) < 0.01  # aspect preserved
