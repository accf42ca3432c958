"""On-device preprocessing vs host path."""

import numpy as np

from ufvideo_tpu.mm_utils import sam_preprocess, siglip_preprocess
from ufvideo_tpu.ops.image_pipeline import (
    sam_preprocess_device,
    siglip_preprocess_device,
)
import jax.numpy as jnp


def test_siglip_device_close_to_host():
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (2, 100, 140, 3), np.uint8)
    host = siglip_preprocess(list(frames))
    dev = np.asarray(
        siglip_preprocess_device(jnp.asarray(frames), out_dtype=jnp.float32)
    )
    assert dev.shape == host.shape == (2, 384, 384, 3)
    # PIL and jax bicubic kernels differ slightly at edges; values must be
    # the same scale and highly correlated
    assert np.abs(dev - host).mean() < 0.05
    c = np.corrcoef(dev.ravel(), host.ravel())[0, 1]
    assert c > 0.99


def test_sam_device_close_to_host():
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 255, (1, 64, 80, 3), np.uint8)
    host = sam_preprocess(list(frames))
    dev = np.asarray(
        sam_preprocess_device(jnp.asarray(frames), out_dtype=jnp.float32)
    )
    assert dev.shape == host.shape == (1, 1024, 1024, 3)
    assert np.abs(dev - host).mean() < 0.2
