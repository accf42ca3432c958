"""Benchmark dataset adapters.

Each adapter turns a benchmark's annotation JSON into native sample dicts
(numpy NHWC pixel tensors, static region metadata) consumed by the shared
inference driver. Mirrors the per-benchmark Dataset classes in the
reference's eval drivers (reference: eval/inference_PixRQA.py:76-165 and
siblings) including the dense-frame bookkeeping for the SAM branch and the
span-formatted temporal targets.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from .. import rle
from ..constants import NUM_FRAMES
from ..mm_utils import process_video, sam_preprocess


def _annotation_layout(annotations: List[Dict]) -> Dict[str, Any]:
    """Shared annotation bookkeeping (inference_PixRQA.py:101-117): collect
    the union of annotated frame ids, then per-region indices into it."""
    all_frames: List[str] = []
    for ann in annotations:
        for f in ann.keys():
            if f not in all_frames:
                all_frames.append(f)
    all_frames_sorted = sorted(int(f) for f in all_frames)
    frame_pos = {f: i for i, f in enumerate(all_frames_sorted)}
    ann_indices = [
        [frame_pos[int(f)] for f in ann.keys()] for ann in annotations
    ]
    return {
        "frame_ids": all_frames_sorted,
        "ann_indices": ann_indices,
    }


def _decode_masks(
    annotations: List[Dict], height: int, width: int
) -> np.ndarray:
    """Per (region, frame) masks in annotation order
    (inference_PixRQA.py:127-137)."""
    masks = []
    for ann in annotations:
        for f in ann.keys():
            seg = ann[f].get("segmentation") if isinstance(ann[f], dict) else ann[f]
            if seg is None:
                masks.append(np.zeros((height, width), np.uint8))
            else:
                masks.append(rle.ann_to_mask(seg, height, width))
    return np.asarray(masks)


class SegReferBenchmark:
    """PixRQA / PixHQA / PixTRQA / VideoRefer-D style samples: video + region
    annotations (+ SAM frames for [SEG] decoding)."""

    def __init__(
        self,
        video_folder: str,
        data_list: Sequence[Dict],
        num_frames: int = NUM_FRAMES,
        num_sam_frames: Optional[int] = None,
        aspect_ratio: str = "square",
        mode: Optional[str] = None,
        image_size: Optional[int] = None,
        sam_image_size: Optional[int] = None,
    ):
        self.video_folder = video_folder
        self.data_list = list(data_list)
        self.num_frames = num_frames
        self.num_sam_frames = num_sam_frames
        self.aspect_ratio = aspect_ratio
        self.mode = mode
        self.image_size = image_size
        self.sam_image_size = sam_image_size

    def __len__(self):
        return len(self.data_list)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        line = self.data_list[idx]
        video_path = os.path.join(self.video_folder, line["video"])
        annotations = line.get("annotation", [])
        if self.mode == "single" and "frame_idx" in line:
            # VideoRefer-D single mode: keep only the sample's nominated
            # frame per region (inference_videorefer_d_bench.py:94-99)
            fidx = str(line["frame_idx"])
            annotations = [{fidx: ann[fidx]} for ann in annotations]
        layout = _annotation_layout(annotations) if annotations else None

        frame_idx = layout["frame_ids"] if layout else None
        kw = {"image_size": self.image_size} if self.image_size else {}
        video, dense, h, w, raw_dense = process_video(
            video_path,
            aspect_ratio=self.aspect_ratio,
            num_frames=self.num_frames,
            frame_idx=frame_idx,
            **kw,
        )
        sample: Dict[str, Any] = {
            "id": line.get("id", idx),
            "video_name": line["video"],
            "video": video,
            "height": h,
            "width": w,
            "caption": line.get("caption"),
            "line": line,
        }
        if layout:
            sample["frame"] = dense  # SigLIP-processed annotated frames
            sample["ann_indices"] = layout["ann_indices"]
            sample["masks"] = _decode_masks(annotations, h, w)
        # SAM branch: uniformly sampled raw frames, direct-resized to 1024²
        # (inference_PixRQA.py:139-150)
        from ..mm_utils import load_frames

        raw, _, _, _ = load_frames(
            video_path, num_frames=self.num_sam_frames or self.num_frames
        )
        sample["images_sam"] = (
            sam_preprocess(raw, self.sam_image_size)
            if self.sam_image_size
            else sam_preprocess(raw)
        )
        return sample


class MCQABenchmark:
    """MVBench-style MCQA samples."""

    def __init__(self, video_folder: str, data_list, num_frames: int = NUM_FRAMES,
                 image_size: Optional[int] = None):
        self.video_folder = video_folder
        self.data_list = list(data_list)
        self.num_frames = num_frames
        self.image_size = image_size

    def __len__(self):
        return len(self.data_list)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        line = self.data_list[idx]
        d = line["data"] if "data" in line else line
        video_path = os.path.join(self.video_folder, d.get("video", ""))
        bound = None
        if line.get("bound"):
            bound = (d.get("start"), d.get("end"))
        video, _, h, w, _ = process_video(
            video_path,
            s=bound[0] if bound else None,
            e=bound[1] if bound else None,
            num_frames=self.num_frames,
            **({"image_size": self.image_size} if self.image_size else {}),
        )
        question = d["question"]
        options = d["candidates"]
        letters = [chr(ord("A") + i) for i in range(len(options))]
        prompt = (
            question
            + "\nOptions:\n"
            + "\n".join(f"({l}) {o}" for l, o in zip(letters, options))
            + "\nAnswer with the option's letter from the given choices directly and only give the best option."
        )
        gt_letter = letters[options.index(d["answer"])]
        return {
            "id": line.get("id", idx),
            "video": video,
            "question": prompt,
            "options": options,
            "gt": gt_letter,
            "task_type": line.get("task_type", ""),
        }


class TVGBenchmark:
    """Charades-STA temporal grounding samples."""

    PROMPT = (
        "When is <event> occur in the video? Only give the start and end "
        "timestamp."
    )

    def __init__(self, video_folder: str, data_list, num_frames: int = NUM_FRAMES,
                 image_size: Optional[int] = None):
        self.video_folder = video_folder
        self.data_list = list(data_list)
        self.num_frames = num_frames
        self.image_size = image_size

    def __len__(self):
        return len(self.data_list)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        line = self.data_list[idx]
        video_path = os.path.join(self.video_folder, line["video"])
        video, _, h, w, _ = process_video(
            video_path, num_frames=self.num_frames,
            **({"image_size": self.image_size} if self.image_size else {}),
        )
        query = line.get("query") or line.get("event") or line.get("caption")
        return {
            "id": line.get("id", idx),
            "vid": line["video"],
            "video": video,
            "question": self.PROMPT.replace("<event>", query.strip().rstrip(".")),
            "gt": line.get("timestamps") or line.get("gt"),
        }
