"""Custom multi-crop utilities (reference utils/custom_transforms.py:17-131:
border/center crops and TwoHoriCrop), as pure-numpy host ops on HWC frames."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def center_crop_np(frames: np.ndarray, size: int) -> np.ndarray:
    h, w = frames.shape[-3], frames.shape[-2]
    top, left = (h - size) // 2, (w - size) // 2
    return frames[..., top: top + size, left: left + size, :]


def border_crops(frames: np.ndarray, size: int) -> List[np.ndarray]:
    """Four corner crops + center (five-crop)."""
    h, w = frames.shape[-3], frames.shape[-2]
    coords = [(0, 0), (0, w - size), (h - size, 0), (h - size, w - size)]
    crops = [frames[..., t: t + size, l: l + size, :] for t, l in coords]
    crops.append(center_crop_np(frames, size))
    return crops


def two_hori_crop(frames: np.ndarray, size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Left and right horizontal crops (reference TwoHoriCrop): both `size`²,
    anchored at the left and right edges after vertical centering."""
    h, w = frames.shape[-3], frames.shape[-2]
    top = (h - size) // 2
    left_crop = frames[..., top: top + size, 0: size, :]
    right_crop = frames[..., top: top + size, w - size: w, :]
    return left_crop, right_crop
