"""COCO run-length-encoded mask codec, dependency-free.

The reference relies on pycocotools (C) for RLE decode/encode
(reference: ufvideo/mm_utils.py:19-33 annToMask). This is a vectorized numpy
re-implementation of the COCO RLE format (column-major runs, LEB128-ish
char-packed counts) so the data pipeline has no native pycocotools
dependency; a C++ fast path can be dropped in behind the same API.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

_NATIVE: Optional[ctypes.CDLL] = None
_NATIVE_TRIED = False


def _native() -> Optional[ctypes.CDLL]:
    """Load (building on demand) the C++ codec; None → numpy fallback."""
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    csrc = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc")
    so = os.path.join(csrc, "librle_codec.so")
    try:
        if not os.path.exists(so):
            subprocess.run(
                ["make", "-C", csrc], check=True, capture_output=True
            )
        lib = ctypes.CDLL(so)
        lib.rle_decode.restype = ctypes.c_int
        lib.rle_encode.restype = ctypes.c_int
        lib.rle_area.restype = ctypes.c_int64
        _NATIVE = lib
    except Exception:
        _NATIVE = None
    return _NATIVE


def _decode_counts(s: Union[str, bytes]) -> List[int]:
    """COCO compressed counts string → run lengths."""
    if isinstance(s, bytes):
        s = s.decode("ascii")
    counts: List[int] = []
    p = 0
    while p < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[p]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def _encode_counts(counts: Sequence[int]) -> str:
    """Run lengths → COCO compressed counts string."""
    out = []
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def decode(rle: Dict) -> np.ndarray:
    """RLE dict {'size': [h, w], 'counts': str|bytes|list} → uint8 mask."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        lib = _native()
        if lib is not None:
            raw = counts.encode("ascii") if isinstance(counts, str) else counts
            out = np.empty(h * w, np.uint8)
            rc = lib.rle_decode(
                raw, len(raw), h, w,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            if rc == 0:
                return out.reshape((h, w), order="F")
        counts = _decode_counts(counts)
    counts = np.asarray(counts, dtype=np.int64)
    values = np.zeros(len(counts), dtype=np.uint8)
    values[1::2] = 1  # runs alternate 0, 1, 0, 1, ...
    flat = np.repeat(values, counts)
    if flat.size != h * w:
        # a run-length sum that disagrees with size means corrupt data
        # (size recorded [w, h], truncated counts, ...) — fail loudly
        # instead of tiling/truncating a silently-wrong mask
        raise ValueError(
            f"RLE counts sum to {flat.size}, expected h*w={h * w}"
        )
    return flat.reshape((h, w), order="F")


def encode(mask: np.ndarray) -> Dict:
    """uint8/bool mask [h, w] → compressed RLE dict."""
    h, w = mask.shape
    lib = _native()
    if lib is not None:
        flat = np.ascontiguousarray(
            np.asarray(mask, np.uint8).reshape(-1, order="F")
        )
        cap = 16 + 8 * (h * w // 2 + 4)
        buf = ctypes.create_string_buffer(cap)
        n = lib.rle_encode(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h, w, buf, cap,
        )
        if n >= 0:
            return {"size": [h, w], "counts": buf.raw[:n].decode("ascii")}
    flat = np.asarray(mask, dtype=np.uint8).reshape(-1, order="F")
    # run boundaries
    change = np.nonzero(np.diff(flat))[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [flat.size]])
    runs = (ends - starts).tolist()
    if flat.size and flat[0] == 1:
        runs = [0] + runs
    return {"size": [h, w], "counts": _encode_counts(runs)}


def merge(rles: Sequence[Dict]) -> Dict:
    """Union of masks (the reference merges polygon parts,
    mm_utils.py:24-25)."""
    out = decode(rles[0])
    for r in rles[1:]:
        out |= decode(r)
    return encode(out)


def poly_to_rle(polys: Sequence[Sequence[float]], h: int, w: int) -> Dict:
    """Polygon(s) → RLE via rasterization (pycocotools frPyObjects analog)."""
    import cv2

    mask = np.zeros((h, w), dtype=np.uint8)
    pts = [
        np.asarray(p, dtype=np.float64).reshape(-1, 2).round().astype(np.int32)
        for p in polys
    ]
    cv2.fillPoly(mask, pts, 1)
    return encode(mask)


def ann_to_mask(mask_ann, h: int | None = None, w: int | None = None) -> np.ndarray:
    """Reference annToMask (mm_utils.py:22-33): polygons, uncompressed RLE,
    or compressed RLE → binary mask (decode handles both RLE flavors)."""
    if isinstance(mask_ann, list):
        if h is None or w is None:
            raise ValueError(
                "polygon annotations need explicit h/w to rasterize"
            )
        return decode(poly_to_rle(mask_ann, h, w))
    return decode(mask_ann)
