"""Eval-harness plumbing: rank sharding, per-rank JSONL files, mask dumps.

Preserves the reference's distribution protocol (SURVEY §2d): dataset sliced
per rank with round-robin-free chunking (reference: inference_PixRQA.py:36-45
split_list/get_chunk), each rank writes ``{output}_rank{r}.json`` JSONL
(:214), scorers merge via filename glob. No collectives are needed —
rank identity comes from JAX process info or torchrun-style env vars, so the
same driver runs single-process or fleet-wide.
"""

from __future__ import annotations

import json
import math
import os
from typing import Any, Dict, Iterable, List, Sequence

import numpy as np


def get_rank_world() -> tuple:
    """(rank, world) from env (torchrun-compatible) or JAX process info."""
    if "RANK" in os.environ:
        return int(os.environ["RANK"]), int(os.environ.get("WORLD_SIZE", 1))
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def split_chunks(items: Sequence, n: int) -> List[Sequence]:
    """Split into n contiguous chunks (ceil-sized, like the reference's
    split_list)."""
    size = math.ceil(len(items) / n)
    return [items[i * size : (i + 1) * size] for i in range(n)]


def get_chunk(items: Sequence, n: int, k: int) -> Sequence:
    chunks = split_chunks(items, n)
    return chunks[k] if k < len(chunks) else []


def rank_output_path(base: str, rank: int) -> str:
    root, ext = os.path.splitext(base)
    return f"{root}_rank{rank}{ext or '.json'}"


class JsonlWriter:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "w")

    def write(self, record: Dict[str, Any]) -> None:
        self._f.write(json.dumps(record) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


def read_all_ranks(base: str) -> List[Dict[str, Any]]:
    """Merge every rank's JSONL (scorer-side glob, e.g.
    eval_video_TVG.py:47)."""
    import glob as _glob

    root, ext = os.path.splitext(base)
    out: List[Dict[str, Any]] = []
    for path in sorted(_glob.glob(f"{root}_rank*{ext or '.json'}")):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
    return out


def save_mask_pngs(out_dir: str, sample_id, masks: np.ndarray) -> None:
    """Per-frame binary mask PNGs named by frame index
    (inference_PixRQA.py:268-283 protocol)."""
    import cv2

    d = os.path.join(out_dir, str(sample_id))
    os.makedirs(d, exist_ok=True)
    for i, m in enumerate(masks):
        cv2.imwrite(
            os.path.join(d, f"{i}.png"),
            (np.asarray(m) > 0).astype(np.uint8) * 255,
        )


def load_mask_pngs(pred_dir: str, sample_id) -> List[np.ndarray]:
    import cv2
    import glob as _glob

    d = os.path.join(pred_dir, str(sample_id))
    paths = sorted(
        _glob.glob(os.path.join(d, "*.png")),
        key=lambda p: int(os.path.splitext(os.path.basename(p))[0]),
    )
    return [
        (cv2.imread(p, cv2.IMREAD_GRAYSCALE) > 127).astype(np.uint8)
        for p in paths
    ]
