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
