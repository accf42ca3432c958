"""Generic dataset/collator layout contracts (reference train.py:340-415,
601-676): region slots per (annotation, frame) pair, annotated-key SAM
supervision, text-only records, mixed-batch collation, sampler interleave."""

import json

import numpy as np
import pytest

from ufvideo_tpu import rle
from ufvideo_tpu.configs import tiny_config
from ufvideo_tpu.constants import VIDEO_TOKEN_INDEX
from ufvideo_tpu.tokenization import ByteTokenizer
from ufvideo_tpu.train.data import (
    Collator,
    SupervisedVideoDataset,
    TrainSample,
    modality_length_groups,
)

H = W = 48
N_FRAMES = 12


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("layouts")
    d = root / "vid"
    d.mkdir()
    rng = np.random.default_rng(2)
    for f in range(N_FRAMES):
        cv2.imwrite(str(d / f"{f:03d}.png"),
                    rng.integers(0, 255, (H, W, 3), np.uint8))
    return root


def _mask(v):
    m = np.zeros((H, W), np.uint8)
    m[4 + v : 20 + v, 8:30] = 1
    return m


def _make_ds(root, records):
    p = root / "data.json"
    p.write_text(json.dumps(records))
    return SupervisedVideoDataset(
        [str(p)], ByteTokenizer(), tiny_config(), video_root=str(root), seed=0
    )


def test_region_slots_are_annotation_frame_pairs(video_dir):
    """Two annotations sharing frame 3: each (annotation, frame) pair gets
    its OWN slot so each region pools against its own mask — the reference's
    masks list is parallel to the flattened ann_indices (train.py:366-375 +
    628-637, layer.py:93-97), never one-mask-per-unique-frame."""
    rec = {
        "video": "vid",
        "annotation": [
            {"3": {"segmentation": rle.encode(_mask(0))},
             "7": {"segmentation": rle.encode(_mask(1))}},
            {"3": {"segmentation": rle.encode(_mask(4))}},
        ],
        "conversations": [
            {"from": "human",
             "value": "<video>\nDescribe <region> and <region>."},
            {"from": "gpt", "value": "Two objects."},
        ],
    }
    s = _make_ds(video_dir, [rec])[0]
    # 3 pairs -> 3 slots; slots 0 and 2 carry the SAME frame pixels
    assert s.region_frames.shape[0] == 3
    assert s.region_masks.shape == (3, H, W)
    assert s.ann_indices == [[0, 1], [2]]
    np.testing.assert_array_equal(s.region_frames[0], s.region_frames[2])
    # ...but different masks (annotation 1 vs annotation 2 on frame 3)
    assert not np.array_equal(s.region_masks[0], s.region_masks[2])


def test_seg_supervision_uses_annotated_keys(video_dir):
    """[SEG] samples supervise on frames sampled FROM THE ANNOTATION KEYS
    (as the reference's seg variants do), with gt masks looked up at those
    exact keys — not positional-index heuristics."""
    keyed = {str(f): {"segmentation": rle.encode(_mask(f % 5))}
             for f in (2, 5, 8, 11)}
    rec = {
        "video": "vid",
        "annotation": [keyed],
        "conversations": [
            {"from": "human", "value": "<video>\nSegment the object."},
            {"from": "gpt", "value": "It is [SEG]."},
        ],
    }
    cfg = tiny_config()
    s = _make_ds(video_dir, [rec])[0]
    n_sam = cfg.budget.num_frames_sam
    assert s.images_sam.shape[0] == n_sam
    assert s.gt_masks.shape == (1, n_sam, H, W)
    # every supervised frame has a real (non-zero) gt mask — possible only
    # if the chosen frames are annotated keys
    assert (s.gt_masks.reshape(1, n_sam, -1).max(-1) == 1.0).all()


def test_text_only_record(video_dir):
    rec = {
        "conversations": [
            {"from": "human", "value": "What is 2+2?"},
            {"from": "gpt", "value": "4."},
        ]
    }
    cfg = tiny_config()
    s = _make_ds(video_dir, [rec])[0]
    assert VIDEO_TOKEN_INDEX not in s.input_ids
    assert s.video.shape == (
        cfg.budget.num_frames, cfg.vision.image_size, cfg.vision.image_size, 3
    )
    assert s.video.sum() == 0.0
    assert s.region_frames is None and s.images_sam is None


def test_collator_mixed_batch_and_mask_resolutions():
    """First sample regionless + two region samples at different native mask
    resolutions: no crash, masks land on the patch grid per-sample at native
    scale (a full-canvas mask stays full on the grid regardless of its
    native resolution — zero-padding to a batch-max canvas would shrink the
    smaller sample's coverage)."""
    cfg = tiny_config()
    rng = np.random.RandomState(0)
    v = cfg.vision.image_size
    grid = v // cfg.vision.patch_size
    t = cfg.budget.num_frames

    def plain():
        return TrainSample(
            input_ids=[1, 2, 3], labels=[-100, 2, 3],
            video=rng.randn(t, v, v, 3).astype(np.float32),
        )

    def region(hm, wm):
        s = plain()
        s.region_frames = rng.randn(1, v, v, 3).astype(np.float32)
        s.region_masks = np.ones((1, hm, wm), np.float32)  # full canvas
        s.ann_indices = [[0]]
        return s

    collator = Collator(cfg, region_token_id=-300, seg_token_id=-400)
    batch = collator([plain(), region(30, 40), region(120, 160)])
    rm = batch["region_masks"]
    assert rm.shape == (3, 1, grid, grid)
    # full-canvas masks cover the whole grid for BOTH native resolutions
    assert (rm[1, 0] > 0).all() and (rm[2, 0] > 0).all()
    assert not batch["region_frame_valid"][0].any()


def test_collator_truncates_overflow_regions():
    cfg = tiny_config()  # max_regions=2
    rng = np.random.RandomState(0)
    v = cfg.vision.image_size
    s = TrainSample(
        input_ids=[1, 2], labels=[2, 3],
        video=rng.randn(cfg.budget.num_frames, v, v, 3).astype(np.float32),
    )
    s.region_frames = rng.randn(3, v, v, 3).astype(np.float32)
    s.region_masks = np.ones((3, 16, 16), np.float32)
    s.ann_indices = [[0], [1], [2]]  # one more region than the budget
    collator = Collator(cfg, region_token_id=-300, seg_token_id=-400)
    batch = collator([s])
    assert batch["region_segments"].shape[1] == cfg.budget.max_regions


def test_collator_pads_short_sam_stacks():
    cfg = tiny_config()  # num_frames_sam=2
    rng = np.random.RandomState(0)
    v, ss = cfg.vision.image_size, cfg.sam.hiera.image_size
    s = TrainSample(
        input_ids=[1, 2], labels=[2, 3],
        video=rng.randn(cfg.budget.num_frames, v, v, 3).astype(np.float32),
    )
    s.images_sam = rng.randn(1, ss, ss, 3).astype(np.float32)  # < budget
    s.gt_masks = np.ones((1, 1, 24, 24), np.float32)
    collator = Collator(cfg, region_token_id=-300, seg_token_id=-400)
    batch = collator([s])
    assert batch["images_sam"].shape[1] == cfg.budget.num_frames_sam


def test_modality_length_groups_interleaves_megabatches():
    """The mm and lang megabatches shuffle TOGETHER (reference
    videorefer_trainer.py:189-193) — text-only data must not all land at
    the end of the epoch."""
    n_mm, n_lang, bs = 64, 64, 4
    lengths = list(range(1, n_mm + n_lang + 1))
    modalities = [True] * n_mm + [False] * n_lang
    order = modality_length_groups(lengths, modalities, bs, seed=0)
    assert sorted(order) == list(range(n_mm + n_lang))
    # position of the first lang sample must come well before the mm block
    # ends (probability of this failing under a fair megabatch shuffle with
    # 15+15 full megabatches is ~2^-15)
    first_lang = next(i for i, j in enumerate(order) if j >= n_mm)
    assert first_lang < n_mm - bs
    # megabatches stay modality-pure except the combined trailing batch
    for k in range(0, n_mm + n_lang - 2 * bs, bs):
        mods = {modalities[j] for j in order[k : k + bs]}
        assert len(mods) == 1
