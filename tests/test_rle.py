"""RLE codec: native C++ ↔ numpy parity, round trips, polygon path."""

import numpy as np
import pytest

from ufvideo_tpu import rle


def _random_mask(seed, h=53, w=37):
    return (np.random.RandomState(seed).rand(h, w) > 0.6).astype(np.uint8)


def test_roundtrip():
    for seed in range(3):
        m = _random_mask(seed)
        enc = rle.encode(m)
        np.testing.assert_array_equal(rle.decode(enc), m)


def test_native_matches_numpy():
    lib = rle._native()
    if lib is None:
        pytest.skip("native codec unavailable")
    for seed in range(3):
        m = _random_mask(seed)
        enc_native = rle.encode(m)
        # force numpy paths
        counts_np = rle._encode_counts(
            _runs(m)
        )
        assert enc_native["counts"] == counts_np
        dec_np = rle.decode(
            {"size": enc_native["size"], "counts": rle._decode_counts(enc_native["counts"])}
        )
        np.testing.assert_array_equal(rle.decode(enc_native), dec_np)


def _runs(mask):
    flat = mask.reshape(-1, order="F")
    change = np.nonzero(np.diff(flat))[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [flat.size]])
    runs = (ends - starts).tolist()
    if flat[0] == 1:
        runs = [0] + runs
    return runs


def test_edge_masks():
    for m in (
        np.zeros((8, 8), np.uint8),
        np.ones((8, 8), np.uint8),
        np.eye(16, dtype=np.uint8),
    ):
        np.testing.assert_array_equal(rle.decode(rle.encode(m)), m)


def test_merge_and_polygons():
    a = np.zeros((16, 16), np.uint8)
    a[:8] = 1
    b = np.zeros((16, 16), np.uint8)
    b[:, :8] = 1
    merged = rle.decode(rle.merge([rle.encode(a), rle.encode(b)]))
    np.testing.assert_array_equal(merged, (a | b))

    tri = rle.ann_to_mask([[1, 1, 14, 1, 7, 12]], 16, 16)
    assert 20 < tri.sum() < 120


def test_uncompressed_counts():
    m = rle.ann_to_mask({"size": [4, 4], "counts": [3, 5, 8]})
    assert m.sum() == 5
    assert m.shape == (4, 4)
