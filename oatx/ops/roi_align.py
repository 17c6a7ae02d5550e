"""ROI-align on patch-feature grids (jittable).

The reference pools region features with hard patch masks
(patch_all_masks_from_bbox rasterization); its unit scratchpad
(utils/unit_test/region_roi_example.py) sketches torchvision roi_align as the
finer alternative. oatx ships a real one: bilinear ROI-align over the ViT patch
grid, fully batched/jit-compatible — usable as a drop-in, higher-fidelity
region pooling for the object-aware losses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int = 2,
    samples_per_bin: int = 2,
) -> jnp.ndarray:
    """features (B, H, W, C) + normalized boxes (B, K, 4) [x1,y1,x2,y2] in [0,1]
    → (B, K, output_size, output_size, C), bilinear, half-pixel centers."""
    b, h, w, c = features.shape
    _, k, _ = boxes.shape
    s = output_size * samples_per_bin

    # sampling grid per box: s×s points, bin-centered
    t = (jnp.arange(s) + 0.5) / s                      # (s,) in (0,1)
    x1, y1, x2, y2 = [boxes[..., i] for i in range(4)]  # (B, K)
    xs = x1[..., None] + (x2 - x1)[..., None] * t[None, None]  # (B, K, s)
    ys = y1[..., None] + (y2 - y1)[..., None] * t[None, None]

    # to pixel coords (half-pixel convention)
    px = xs * w - 0.5
    py = ys * h - 0.5

    x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0 + 1, 0, w - 1)
    y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0 + 1, 0, h - 1)
    wx = jnp.clip(px - x0, 0.0, 1.0)
    wy = jnp.clip(py - y0, 0.0, 1.0)

    def gather_b(feat, yy, xx):
        # feat (H, W, C); yy, xx (K, s) → (K, s, C)
        return feat[yy, xx]

    def sample_one(feat, y0b, y1b, x0b, x1b, wyb, wxb):
        # rows: (K, s_y, W?) — do full bilinear via four gathers of (K, s_y, s_x, C)
        p00 = feat[y0b[:, :, None], x0b[:, None, :]]
        p01 = feat[y0b[:, :, None], x1b[:, None, :]]
        p10 = feat[y1b[:, :, None], x0b[:, None, :]]
        p11 = feat[y1b[:, :, None], x1b[:, None, :]]
        wxx = wxb[:, None, :, None]
        wyy = wyb[:, :, None, None]
        top = p00 * (1 - wxx) + p01 * wxx
        bot = p10 * (1 - wxx) + p11 * wxx
        return top * (1 - wyy) + bot * wyy  # (K, s, s, C)

    sampled = jax.vmap(sample_one)(features, y0, y1i, x0, x1i, wy, wx)
    # average pool each bin
    out = sampled.reshape(b, k, output_size, samples_per_bin,
                          output_size, samples_per_bin, c)
    return jnp.mean(out, axis=(3, 5))


def roi_pool_patches(
    patch_tokens: jnp.ndarray,
    boxes: jnp.ndarray,
    grid: int,
    output_size: int = 1,
) -> jnp.ndarray:
    """(B, grid², C) ViT patch tokens + normalized boxes → ROI-aligned region
    features (B, K, C) (output averaged over the output grid)."""
    b, n, c = patch_tokens.shape
    feat = patch_tokens.reshape(b, grid, grid, c)
    out = roi_align(feat, boxes, output_size=max(output_size, 1))
    return jnp.mean(out, axis=(2, 3))
