"""Mask postprocessing.

Hole filling replaces the reference's JIT-compiled connected_components.cu
(reference: sam2.py:4155-4195 fill_holes_in_mask_scores, which wget-downloads
and torch-JIT-compiles a CUDA extension at call time!). Disabled by default
there too (fill_hole_area=0, sam2.py:3531); here it is a host-side cv2
connected-components pass — this is data plumbing, not device work.
"""

from __future__ import annotations

import numpy as np


def fill_holes_in_mask_scores(mask: np.ndarray, max_area: int) -> np.ndarray:
    """Fill background connected components with area <= max_area by setting
    their scores to a small positive value (matching the reference's 0.1
    fill)."""
    import cv2

    if max_area <= 0:
        return mask
    out = np.asarray(mask, np.float32).copy()
    background = (out <= 0).astype(np.uint8)
    n, labels, stats, _ = cv2.connectedComponentsWithStats(background, 8)
    for comp in range(1, n):
        if stats[comp, cv2.CC_STAT_AREA] <= max_area:
            out[labels == comp] = 0.1
    return out
