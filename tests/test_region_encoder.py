"""Region encoder: token_merge parity with the reference algorithm and
mask-pooling correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from ufvideo_tpu.models.region_encoder import (
    extract_region_tokens,
    mask_pool,
    token_merge_static,
)


def reference_token_merge(x: np.ndarray, r: int) -> np.ndarray:
    """Direct numpy re-statement of the reference greedy merge
    (layer.py:6-33) for test oracle purposes."""
    n = x.shape[0]
    x1, x2 = x[:-1], x[1:]
    n1 = x1 / np.linalg.norm(x1, axis=-1, keepdims=True)
    n2 = x2 / np.linalg.norm(x2, axis=-1, keepdims=True)
    sim = np.sum(n1 * n2, axis=-1)
    kth = np.sort(sim)[::-1][r - 1]
    new_tokens, merged = [], []
    for i in range(n - 1):
        merged.append(x[i])
        if sim[i] < kth:
            new_tokens.append(np.mean(merged, axis=0))
            merged = []
    merged.append(x[n - 1])
    new_tokens.append(np.mean(merged, axis=0))
    return np.stack(new_tokens)


def test_token_merge_matches_reference():
    rng = np.random.RandomState(0)
    for n in (5, 7, 11):
        r_out = 4
        x = rng.randn(n, 8).astype(np.float32)
        ref = reference_token_merge(x, n - r_out)
        got, valid = token_merge_static(
            jnp.asarray(x), jnp.ones((n,), bool), r_out
        )
        assert ref.shape[0] == r_out
        assert bool(jnp.all(valid))
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-5)


def test_token_merge_fewer_than_budget():
    x = np.random.RandomState(1).randn(6, 8).astype(np.float32)
    valid = jnp.array([True, True, True, False, False, False])
    got, out_valid = token_merge_static(jnp.asarray(x), valid, 4)
    # only 3 valid tokens → 3 output segments, each a single token
    assert np.asarray(out_valid).tolist() == [True, True, True, False]
    np.testing.assert_allclose(np.asarray(got[:3]), x[:3], atol=1e-6)


def test_mask_pool():
    feats = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    masks = jnp.zeros((2, 4, 4)).at[0, :2, :2].set(1.0).at[1].set(1.0)
    pooled = mask_pool(feats, masks)
    manual0 = np.asarray(feats[0, :2, :2]).reshape(-1, 3).mean(0)
    manual1 = np.asarray(feats[1]).reshape(-1, 3).mean(0)
    np.testing.assert_allclose(np.asarray(pooled[0]), manual0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled[1]), manual1, rtol=1e-5)


def test_extract_region_tokens_shapes():
    f, p, c = 6, 16, 8
    feats = jax.random.normal(jax.random.PRNGKey(0), (f, p, c))
    masks = (jax.random.uniform(jax.random.PRNGKey(1), (f, 32, 32)) > 0.5)
    frame_valid = jnp.array([True] * 5 + [False])
    # region 0 owns frames 0-2, region 1 owns frames 3-4
    segments = jnp.array(
        [
            [True, True, True, False, False, False],
            [False, False, False, True, True, False],
        ]
    )
    toks, valid = extract_region_tokens(
        feats, masks.astype(jnp.float32), frame_valid, segments, 4
    )
    assert toks.shape == (2, 4, c)
    assert np.asarray(valid).tolist() == [
        [True, True, True, False],
        [True, True, False, False],
    ]


def test_resize_mask_matches_torch_bilinear():
    """resize_mask_to_grid == torch F.interpolate(mode='bilinear',
    align_corners=False, antialias=False) — the reference op
    (layer.py:137-139). jax.image.resize would NOT pass this (it
    antialiases on downsample, inflating the >0 support mask_pool
    thresholds on)."""
    import torch
    import torch.nn.functional as F

    from ufvideo_tpu.models.region_encoder import (
        resize_mask_to_grid,
        resize_mask_to_grid_np,
    )

    rng = np.random.default_rng(0)
    for (h, w), grid in [((480, 640), 27), ((32, 32), 27), ((27, 27), 27),
                         ((9, 13), 27), ((720, 1280), 27)]:
        m = (rng.random((3, h, w)) > 0.7).astype(np.float32)
        ref = F.interpolate(
            torch.from_numpy(m)[None], size=(grid, grid), mode="bilinear",
            align_corners=False,
        )[0].numpy()
        got = np.asarray(resize_mask_to_grid(jnp.asarray(m), grid))
        np.testing.assert_allclose(got, ref, atol=2e-6)
        got_np = resize_mask_to_grid_np(m, grid)
        np.testing.assert_allclose(got_np, ref, atol=2e-6)
        # the >0 support (what mask_pool thresholds) must agree exactly
        np.testing.assert_array_equal(got > 0, got_np > 0)
        if (h, w) == (grid, grid):  # identity case
            np.testing.assert_array_equal(got, m)


def test_bicubic_matrix_matches_torch():
    """ops.interp.bicubic_matrix == torch F.interpolate(mode='bicubic',
    align_corners=False) — the Hiera pos-embed path (hiera.py) depends on
    this; jax.image.resize's cubic kernel (Keys a=-0.5 vs torch's -0.75)
    deviates by ~0.2 on unit-std inputs."""
    import torch
    import torch.nn.functional as F

    from ufvideo_tpu.ops.interp import bicubic_matrix

    rng = np.random.default_rng(3)
    for src, dst in [(7, 64), (7, 256), (14, 32), (32, 7), (8, 8)]:
        x = rng.standard_normal((2, 3, src, src)).astype(np.float32)
        ref = F.interpolate(
            torch.from_numpy(x), size=(dst, dst), mode="bicubic",
            align_corners=False,
        ).numpy()
        m = bicubic_matrix(src, dst)
        got = np.einsum("hy,bcyx,wx->bchw", m, x, m)
        np.testing.assert_allclose(got, ref, atol=3e-5)
