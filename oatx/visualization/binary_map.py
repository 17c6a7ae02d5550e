"""Region-grounding binary-map visualization.

Reference test_region_mem.py:128-170: for the top object of a sample, render
[original frame | GT patch mask | predicted region similarity] side by side as
one PNG — the qualitative check that the region BCE loss grounds objects.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from oatx.visualization.heatmap import bilinear_upsample


def _gray_panel(grid: np.ndarray, size: int) -> np.ndarray:
    """14×14-ish values in [0,1] → (size, size, 3) uint8 gray render."""
    up = np.clip(bilinear_upsample(np.asarray(grid, np.float32) * 255.0, size, size), 0, 255)
    return np.stack([up.astype(np.uint8)] * 3, axis=-1)


def render_binary_map(
    frame_rgb: np.ndarray,
    gt_patch_mask: np.ndarray,
    pred_region_sim: np.ndarray,
    label: Optional[str] = None,
    size: int = 224,
) -> np.ndarray:
    """frame (H,W,3 uint8), gt mask (N,), predicted sim (N,) in [0,1] →
    concatenated [frame | gt | pred] uint8 panel."""
    from PIL import Image, ImageDraw

    g = int(round(np.sqrt(gt_patch_mask.size)))
    frame = np.asarray(
        Image.fromarray(np.asarray(frame_rgb, np.uint8)).resize((size, size), Image.BILINEAR))
    if label:
        im = Image.fromarray(frame)
        ImageDraw.Draw(im).text((8, 8), label, fill=(255, 0, 0))
        frame = np.asarray(im)
    gt = _gray_panel(gt_patch_mask.reshape(g, g), size)
    pred = _gray_panel(np.asarray(pred_region_sim, np.float32).reshape(g, g), size)
    return np.concatenate([frame, gt, pred], axis=1)


def save_binary_map(path: str, frame_rgb, gt_patch_mask, pred_region_sim,
                    label: Optional[str] = None) -> str:
    from PIL import Image

    panel = render_binary_map(frame_rgb, gt_patch_mask, pred_region_sim, label)
    Image.fromarray(panel).save(path)
    return path
