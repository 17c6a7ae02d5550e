"""Device-side batched image/video transforms (jitted).

The reference applies torchvision transforms per sample on CPU workers
(/root/reference/OATrans/data_loader/transforms.py:4-31):
  train: RandomResizedCrop(224, scale=(0.5,1)) + RandomHorizontalFlip +
         ColorJitter(0,0,0) + Normalize(ImageNet)
  val/test: Resize(256) + CenterCrop(256) + Resize(224) + Normalize

oatx moves this onto the TPU: the host ships canonical uint8 frames
(short-side-resized + center-cropped to `canon`² by the native decoder + numpy),
and augmentation runs as fused XLA ops on the batch inside the train step — the
host→device transfer is uint8 and the float math rides the VPU.

Deliberate divergence (documented): the train-time random crop is taken from the
canonical center square rather than the full frame (keeps batch shapes static);
crop box sampling uses a single clamped draw instead of torchvision's
10-attempt rejection loop. Eval matches the reference chain exactly
(short-side 256 → center 256 → bilinear 224 → normalize), which is what
checkpoint-parity numbers depend on. One crop/flip per *clip* (torchvision picks
one RandomResizedCrop per tensor call, giving temporally consistent crops).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class TransformConfig:
    input_res: int = 224
    center_crop: int = 256
    randcrop_scale: Tuple[float, float] = (0.5, 1.0)
    randcrop_ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0)
    color_jitter: Tuple[float, float, float] = (0.0, 0.0, 0.0)  # brightness, saturation, hue
    norm_mean: Tuple[float, float, float] = IMAGENET_MEAN
    norm_std: Tuple[float, float, float] = IMAGENET_STD
    host_precropped: bool = False  # frames arrive already RandomResizedCropped
    # to input_res² by the host (train_crop='reference_full_frame' on the
    # dataset): the device-side train chain skips crop/resize and applies only
    # flip + jitter + normalize.


def normalize(x: jnp.ndarray, cfg: TransformConfig = TransformConfig()) -> jnp.ndarray:
    mean = jnp.asarray(cfg.norm_mean, x.dtype)
    std = jnp.asarray(cfg.norm_std, x.dtype)
    return (x - mean) / std


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C), half-pixel centers (torch
    align_corners=False), no antialias (matches torchvision tensor Resize of the
    reference's era)."""
    shape = x.shape[:-3] + (out_h, out_w, x.shape[-1])
    return jax.image.resize(x, shape, method="bilinear", antialias=False)


def center_crop(x: jnp.ndarray, size: int) -> jnp.ndarray:
    h, w = x.shape[-3], x.shape[-2]
    top = (h - size) // 2
    left = (w - size) // 2
    return x[..., top: top + size, left: left + size, :]


def _bilinear_crop_resize(
    clip: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray,
    ch: jnp.ndarray, cw: jnp.ndarray, out: int,
) -> jnp.ndarray:
    """Sample an (out, out) bilinear resize of crop box [y0, y0+ch) × [x0, x0+cw)
    from clip (F, H, W, C). Box coords are float pixels; fully dynamic (traced)."""
    f, h, w, c = clip.shape
    ys = y0 + (jnp.arange(out) + 0.5) * (ch / out) - 0.5
    xs = x0 + (jnp.arange(out) + 0.5) * (cw / out) - 0.5
    y0i = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x0i = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    wy = jnp.clip(ys - y0i, 0.0, 1.0)[:, None, None]
    wx = jnp.clip(xs - x0i, 0.0, 1.0)[None, :, None]

    rows0 = clip[:, y0i]          # (F, out, W, C)
    rows1 = clip[:, y1i]
    p00 = rows0[:, :, x0i]        # (F, out, out, C)
    p01 = rows0[:, :, x1i]
    p10 = rows1[:, :, x0i]
    p11 = rows1[:, :, x1i]
    top = p00 * (1 - wx) + p01 * wx
    bot = p10 * (1 - wx) + p11 * wx
    return top * (1 - wy) + bot * wy


def random_resized_crop(
    rng: jax.Array, video: jnp.ndarray, cfg: TransformConfig
) -> jnp.ndarray:
    """(B, F, H, W, C) float → (B, F, S, S, C); one crop per clip."""
    b, f, h, w, c = video.shape
    k_area, k_ratio, k_y, k_x = jax.random.split(rng, 4)
    area = jax.random.uniform(k_area, (b,), minval=cfg.randcrop_scale[0],
                              maxval=cfg.randcrop_scale[1]) * (h * w)
    log_r = jax.random.uniform(
        k_ratio, (b,), minval=np.log(cfg.randcrop_ratio[0]),
        maxval=np.log(cfg.randcrop_ratio[1]))
    ratio = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * ratio), 8.0, w)
    ch = jnp.clip(jnp.sqrt(area / ratio), 8.0, h)
    y0 = jax.random.uniform(k_y, (b,)) * (h - ch)
    x0 = jax.random.uniform(k_x, (b,)) * (w - cw)
    return jax.vmap(
        lambda clipv, a, bb, cc, dd: _bilinear_crop_resize(clipv, a, bb, cc, dd, cfg.input_res)
    )(video, y0, x0, ch, cw)


def random_hflip(rng: jax.Array, video: jnp.ndarray) -> jnp.ndarray:
    b = video.shape[0]
    flip = jax.random.bernoulli(rng, 0.5, (b,))
    return jnp.where(flip[:, None, None, None, None], video[..., ::-1, :], video)


def color_jitter(rng: jax.Array, video: jnp.ndarray, cfg: TransformConfig) -> jnp.ndarray:
    """Brightness/saturation/hue jitter (per clip). Disabled at the reference's
    defaults (0,0,0). Hue uses the YIQ-rotation approximation."""
    bj, sj, hj = cfg.color_jitter
    if bj == 0 and sj == 0 and hj == 0:
        return video
    kb, ks, kh = jax.random.split(rng, 3)
    b = video.shape[0]
    shape = (b, 1, 1, 1, 1)
    if bj > 0:
        fac = jax.random.uniform(kb, shape, minval=max(0, 1 - bj), maxval=1 + bj)
        video = video * fac
    if sj > 0:
        fac = jax.random.uniform(ks, shape, minval=max(0, 1 - sj), maxval=1 + sj)
        gray = jnp.mean(video, axis=-1, keepdims=True)
        video = gray + (video - gray) * fac
    if hj > 0:
        theta = jax.random.uniform(kh, (b, 1, 1, 1), minval=-hj, maxval=hj) * 2 * np.pi
        yiq_from_rgb = jnp.asarray(
            [[0.299, 0.587, 0.114], [0.596, -0.274, -0.322], [0.211, -0.523, 0.312]],
            video.dtype)
        rgb_from_yiq = jnp.linalg.inv(yiq_from_rgb)
        yiq = jnp.einsum("...c,dc->...d", video, yiq_from_rgb)
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        i, q = yiq[..., 1], yiq[..., 2]
        yiq = jnp.stack([yiq[..., 0], i * cos - q * sin, i * sin + q * cos], axis=-1)
        video = jnp.einsum("...c,dc->...d", yiq, rgb_from_yiq)
    return jnp.clip(video, 0.0, 1.0)


def train_augment(
    rng: jax.Array, video_u8: jnp.ndarray, cfg: TransformConfig = TransformConfig()
) -> jnp.ndarray:
    """uint8 canonical frames (B, F, canon, canon, C) → augmented normalized float."""
    k_crop, k_flip, k_jit = jax.random.split(rng, 3)
    x = video_u8.astype(jnp.float32) / 255.0
    if cfg.host_precropped:
        assert x.shape[-2] == cfg.input_res, (
            f"host_precropped expects input_res² frames, got {x.shape}")
    else:
        x = random_resized_crop(k_crop, x, cfg)
    x = random_hflip(k_flip, x)
    x = color_jitter(k_jit, x, cfg)
    return normalize(x, cfg)


def eval_transform(
    video_u8: jnp.ndarray, cfg: TransformConfig = TransformConfig()
) -> jnp.ndarray:
    """uint8 frames already short-side-resized+center-cropped to cfg.center_crop²
    → bilinear resize to input_res + normalize (reference val/test chain)."""
    x = video_u8.astype(jnp.float32) / 255.0
    x = resize_bilinear(x, cfg.input_res, cfg.input_res)
    return normalize(x, cfg)


# ------------------------------------------------------------------ host side

def tv_random_resized_crop_params(
    rng: np.random.Generator, height: int, width: int,
    scale: Tuple[float, float] = (0.5, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> Tuple[int, int, int, int]:
    """torchvision RandomResizedCrop.get_params, re-expressed over an explicit
    np.random.Generator (oatx determinism convention): 10 attempts sampling
    crop area = U(scale)·H·W and aspect = exp(U(log ratio)), integer sides via
    round(sqrt(·)), accepted iff the box fits; else the deterministic fallback
    (ratio-clamped center crop). This is the reference's train-crop geometry
    (data_loader/transforms.py:12 RandomResizedCrop(224, scale=(0.5,1)));
    oatx's default device-side crop diverges (canonical-center source square —
    module docstring), so this host-faithful option exists to ABLATE that
    divergence on real data. Returns (top, left, crop_h, crop_w)."""
    area = float(height) * float(width)
    log_ratio = (np.log(ratio[0]), np.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = float(np.exp(rng.uniform(log_ratio[0], log_ratio[1])))
        w = int(round(np.sqrt(target_area * aspect)))
        h = int(round(np.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            top = int(rng.integers(0, height - h + 1))
            left = int(rng.integers(0, width - w + 1))
            return top, left, h, w
    # fallback: ratio-clamped center crop (torchvision's exact formula)
    in_ratio = float(width) / float(height)
    if in_ratio < ratio[0]:
        w = width
        h = int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        h = height
        w = int(round(h * ratio[1]))
    else:
        w, h = width, height
    top = (height - h) // 2
    left = (width - w) // 2
    return top, left, h, w


def _np_bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Half-pixel-center bilinear (align_corners=False, no antialias) over
    (..., H, W, C) — the same sampling as resize_bilinear, on the host."""
    h, w = img.shape[-3], img.shape[-2]
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0).reshape(-1, 1, 1)
    wx = np.clip(xs - x0, 0.0, 1.0).reshape(1, -1, 1)
    f = img.astype(np.float32)
    rows0, rows1 = f[..., y0, :, :], f[..., y1, :, :]
    p00, p01 = rows0[..., x0, :], rows0[..., x1, :]
    p10, p11 = rows1[..., x0, :], rows1[..., x1, :]
    top = p00 * (1 - wx) + p01 * wx
    bot = p10 * (1 - wx) + p11 * wx
    return top * (1 - wy) + bot * wy


def host_reference_rrc(
    frames_u8: np.ndarray, rng: np.random.Generator, out: int = 224,
    scale: Tuple[float, float] = (0.5, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> np.ndarray:
    """Reference-faithful train crop ON THE HOST: one torchvision-style
    RandomResizedCrop box per clip over the FULL frame (torchvision applies one
    get_params per tensor call → temporally consistent crops), bilinear to
    out². (F, H, W, C) uint8 → (F, out, out, C) uint8."""
    f, h, w, c = frames_u8.shape
    top, left, ch, cw = tv_random_resized_crop_params(rng, h, w, scale, ratio)
    crop = frames_u8[:, top: top + ch, left: left + cw, :]
    res = _np_bilinear_resize(crop, out, out)
    return np.clip(np.rint(res), 0, 255).astype(np.uint8)


def host_canonicalize(frames_u8: np.ndarray, canon: int = 256) -> np.ndarray:
    """Center-crop short-side-resized uint8 frames (F, H, W, C) to (F, canon,
    canon, C). The native decoder already made min(H, W) == canon."""
    f, h, w, c = frames_u8.shape
    assert min(h, w) >= canon, f"frames ({h}x{w}) smaller than canon {canon}"
    top = (h - canon) // 2
    left = (w - canon) // 2
    return np.ascontiguousarray(frames_u8[:, top: top + canon, left: left + canon, :])
