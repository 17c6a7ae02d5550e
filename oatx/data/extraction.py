"""Offline object-feature extraction pipeline (ObjectExtractor equivalent).

The reference's ObjectExtractor (multiprocess_full_webvid_multiframe_*.py) drives
an external BUTD/detectron2 GPU detector over 8 uniformly-sampled frames per clip
(ObjectExtractor/...webvid...py:91-99,180-190) and writes one `.npz {x, bbox,
info}` per frame, resumably. oatx reproduces the *pipeline* (work-list sharding,
uniform frame grid, resumable skip/loss-list accounting, multiprocess workers,
progress counters) with a pluggable detector — three shipped, all working:

  * StubDetector         — deterministic synthetic regions (hermetic tests/demos).
  * TorchScriptDetector  — adapter for ANY torch detector exported as a
                           TorchScript module (torch.jit.load; fully offline).
                           The module contract is frame → (features, boxes,
                           class_ids, confidences); wrap BUTD/detectron2 or a
                           torchvision model behind that signature and export.
  * RoiBackboneExtractor — the TPU-native path the reference cannot do: given
                           proposer boxes, frames go through oatx's own
                           first-party backbone (the trained video tower) and
                           region features are ROI-align pooled from its patch
                           grid under jit (oatx.ops.roi_align). Regenerates the
                           same npz contract with no detectron2/GPU dependency.

Output contract matches the training-side readers exactly
(oatx.data.objects._load_npz / reference base_dataset.py:604-650).
"""

from __future__ import annotations

import dataclasses
import multiprocessing as mp
import os
import time
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from oatx.data.sampling import sample_frames

Detection = Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]
# (features (N,2048), boxes (N,4) xyxy pixels, class_ids (N,), confidences (N,))


class StubDetector:
    """Deterministic pseudo-detector: features/boxes derived from frame content
    hashes — hermetic stand-in so the full pipeline runs without model weights."""

    def __init__(self, num_regions: int = 10, num_classes: int = 1600,
                 feature_dim: int = 2048):
        self.num_regions = num_regions
        self.num_classes = num_classes
        self.feature_dim = feature_dim

    def __call__(self, frame_rgb: np.ndarray) -> Detection:
        h, w = frame_rgb.shape[:2]
        seed = int(np.asarray(frame_rgb, np.uint64).sum() % (2**31))
        rng = np.random.default_rng(seed)
        n = self.num_regions
        feats = np.abs(rng.standard_normal((n, self.feature_dim))).astype(np.float32)
        x1 = rng.uniform(0, w * 0.6, n)
        y1 = rng.uniform(0, h * 0.6, n)
        boxes = np.stack([
            x1, y1,
            x1 + rng.uniform(w * 0.2, w * 0.4, n),
            y1 + rng.uniform(h * 0.2, h * 0.4, n),
        ], axis=1).astype(np.float32)
        boxes[:, 2] = np.minimum(boxes[:, 2], w - 1)
        boxes[:, 3] = np.minimum(boxes[:, 3], h - 1)
        ids = rng.integers(0, self.num_classes, n)
        confs = np.sort(rng.uniform(0.3, 1.0, n))[::-1].astype(np.float32)
        return feats, boxes, ids, confs


class TorchScriptDetector:
    """Adapter for a real torch detector exported as TorchScript.

    The reference hard-requires the external bottom-up-attention.pytorch
    (detectron2 R101) stack at import time
    (ObjectExtractor/...webvid...py:91-99); oatx instead takes the detector as
    a self-contained TorchScript artifact (torch.jit.load — fully offline, no
    model code needed on this host). Export contract: the scripted module maps
    a float32 CHW image in [0,1] to a 4-tuple
    (features (N,D), boxes (N,4) xyxy pixels, class_ids (N,), confidences (N,)).
    Wrap BUTD/detectron2 (or a torchvision detection model) behind that
    signature on the machine that has it, `torch.jit.script(...).save(path)`,
    and point --detector-weights here."""

    def __init__(self, weights_path: str):
        import torch

        self.torch = torch
        self.module = torch.jit.load(weights_path, map_location="cpu")
        self.module.eval()

    def __call__(self, frame_rgb: np.ndarray) -> Detection:
        t = self.torch.from_numpy(
            np.ascontiguousarray(frame_rgb, np.float32) / 255.0
        ).permute(2, 0, 1)
        with self.torch.no_grad():
            feats, boxes, ids, confs = self.module(t)
        return (feats.numpy().astype(np.float32),
                boxes.numpy().astype(np.float32),
                ids.numpy(),
                confs.numpy().astype(np.float32))


def load_torch_detector(weights_path: str):
    """Load a TorchScript detector artifact (see TorchScriptDetector)."""
    return TorchScriptDetector(weights_path)


class RoiBackboneExtractor:
    """TPU-side region-feature extractor: proposer boxes + oatx's own backbone.

    Beats the reference's extraction story on its own terms: the reference
    NEEDS detectron2 + GPUs to (re)generate object features; oatx batches
    frames through its first-party video tower (any trained oatx checkpoint —
    the same weights training/serving already use) and pools region features
    from the final-layer patch grid with bilinear ROI-align
    (oatx.ops.roi_align) under jit. Writes the identical npz contract
    (base_dataset.py:604-650 consumers), with backbone features zero-padded to
    the 2048-d slot when the tower is narrower, so the region_mem /
    global_local lanes consume the output unchanged.

    `proposer(frame) → (boxes_xyxy_pixels (K,4), class_ids (K,), confs (K,))`
    supplies the regions; the default reuses StubDetector's deterministic
    content-hash boxes (a saliency/region-proposal model can be plugged the
    same way). Frames are stretch-resized to the tower's square input — boxes
    are proposed in original pixel space and stored in original pixel space
    (consumers normalize by the stored image_w/h, objects.py
    scaled_box_geometry), so the stretch does not skew the contract."""

    def __init__(self, params, tower_cfg, proposer=None, num_regions: int = 10,
                 output_size: int = 2, feature_pad: int = 2048):
        import jax
        import jax.numpy as jnp

        from oatx.data import transforms as T
        from oatx.models import vit_spacetime as vst
        from oatx.ops.roi_align import roi_align

        self.cfg = tower_cfg
        self.num_regions = num_regions
        self.feature_pad = feature_pad
        if proposer is None:
            stub = StubDetector(num_regions=num_regions)
            proposer = lambda f: stub(f)[1:]  # boxes, ids, confs
        self.proposer = proposer
        size = tower_cfg.video.img_size
        self.size = size
        grid = size // tower_cfg.video.patch_size
        tcfg = T.TransformConfig(input_res=size)

        def features_fn(p, frame_u8, boxes_norm):
            # (1, 1, S, S, 3) uint8 + (1, K, 4) normalized xyxy → (K, D)
            x = T.normalize(frame_u8.astype(jnp.float32) / 255.0, tcfg)
            out = vst.apply(p["video"], tower_cfg.video,
                            x.astype(tower_cfg.compute_dtype))
            patches = out["patches"].astype(jnp.float32)  # (1, N, D) at F=1
            fmap = patches.reshape(1, grid, grid, patches.shape[-1])
            pooled = roi_align(fmap, boxes_norm, output_size=output_size)
            return pooled.mean(axis=(2, 3))[0]  # (K, D)

        self._features = jax.jit(features_fn)
        self._params = params

    def __call__(self, frame_rgb: np.ndarray) -> Detection:
        import jax.numpy as jnp

        h, w = frame_rgb.shape[:2]
        boxes, ids, confs = self.proposer(frame_rgb)
        boxes = np.asarray(boxes, np.float32)[: self.num_regions]
        norm = boxes / np.asarray([w, h, w, h], np.float32)
        frame_sq = _stretch_resize_u8(frame_rgb, self.size)
        feats = np.asarray(self._features(
            self._params,
            jnp.asarray(frame_sq)[None, None],
            jnp.asarray(np.clip(norm, 0.0, 1.0))[None]))
        if feats.shape[1] < self.feature_pad:
            feats = np.concatenate(
                [feats, np.zeros((feats.shape[0],
                                  self.feature_pad - feats.shape[1]),
                                 np.float32)], axis=1)
        return feats.astype(np.float32), boxes, np.asarray(ids), \
            np.asarray(confs, np.float32)


def _stretch_resize_u8(frame: np.ndarray, size: int) -> np.ndarray:
    """(H, W, 3) uint8 → (size, size, 3) uint8, bilinear, half-pixel centers.
    Pure numpy so extraction workers never touch the accelerator for resize."""
    h, w = frame.shape[:2]
    if h == size and w == size:
        return frame
    ys = (np.arange(size) + 0.5) * (h / size) - 0.5
    xs = (np.arange(size) + 0.5) * (w / size) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    f = frame.astype(np.float32)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    return np.clip(top * (1 - wy) + bot * wy + 0.5, 0, 255).astype(np.uint8)


def save_roi_npz(path: str, features, boxes, class_ids, confs,
                 image_w: int, image_h: int) -> None:
    """Write the reference npz format (ObjectExtractor alex_save_roi_features)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    info = {
        "objects_id": np.asarray(class_ids),
        "objects_conf": np.asarray(confs, np.float32),
        "image_w": image_w,
        "image_h": image_h,
    }
    np.savez(path, x=np.asarray(features, np.float32),
             bbox=np.asarray(boxes, np.float32), info=info)


@dataclasses.dataclass
class ExtractionStats:
    processed: int = 0
    skipped: int = 0
    failed: int = 0
    frames: int = 0


def extract_video(
    video_path: str,
    out_dir: str,
    detector: Callable[[np.ndarray], Detection],
    num_extraction_frames: int = 8,
    overwrite: bool = False,
) -> Tuple[int, int]:
    """Extract the uniform frame grid of one clip → out_dir/<slot>.npz.
    Returns (frames_written, frames_skipped). Resumable: existing npz skipped
    (reference :165-176)."""
    from oatx.data import video_reader as vr

    todo = [s for s in range(num_extraction_frames)
            if overwrite or not os.path.exists(os.path.join(out_dir, f"{s}.npz"))]
    if not todo:
        return 0, num_extraction_frames
    with vr.VideoHandle(video_path) as handle:
        vlen, _, w, h = handle.info()
        grid = sample_frames(num_extraction_frames, max(vlen, 1), sample="uniform")
        if len(grid) < num_extraction_frames:
            # clips shorter than the grid repeat their last frame (same semantics
            # as the loader's short-video pad) — without this, slots beyond vlen
            # IndexError and the resumable pipeline retries the clip forever
            grid = grid + [grid[-1]] * (num_extraction_frames - len(grid))
        frames = handle.decode([grid[s] for s in todo], short_side=0)
    for frame, slot in zip(frames, todo):
        feats, boxes, ids, confs = detector(frame)
        save_roi_npz(os.path.join(out_dir, f"{slot}.npz"),
                     feats, boxes, ids, confs, frame.shape[1], frame.shape[0])
    return len(todo), num_extraction_frames - len(todo)


def _worker(args):
    (worker_id, items, out_root, detector, n_frames, overwrite) = args
    stats = ExtractionStats()
    for video_id, video_path in items:
        try:
            written, skipped = extract_video(
                video_path, os.path.join(out_root, video_id), detector,
                n_frames, overwrite)
            stats.frames += written
            if written:
                stats.processed += 1
            else:
                stats.skipped += 1
        except Exception:
            stats.failed += 1
    return dataclasses.asdict(stats)


def extract_dataset(
    items: Sequence[Tuple[str, str]],
    out_root: str,
    detector: Optional[Callable[[np.ndarray], Detection]] = None,
    num_workers: int = 4,
    num_extraction_frames: int = 8,
    overwrite: bool = False,
    use_processes: bool = False,
) -> Dict:
    """Extract all (video_id, video_path) items with a worker pool.

    Threads by default (the decode + numpy detector path releases the GIL);
    use_processes=True matches the reference's torch.multiprocessing spawn model
    for detectors that need process isolation."""
    detector = detector or StubDetector()
    shards: List[List[Tuple[str, str]]] = [[] for _ in range(num_workers)]
    for i, item in enumerate(items):
        shards[i % num_workers].append(item)
    args = [(w, shard, out_root, detector, num_extraction_frames, overwrite)
            for w, shard in enumerate(shards) if shard]

    t0 = time.time()
    if use_processes:
        with mp.get_context("spawn").Pool(len(args)) as pool:
            results = pool.map(_worker, args)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(args)) as pool:
            results = list(pool.map(_worker, args))
    total = ExtractionStats()
    for r in results:
        total.processed += r["processed"]
        total.skipped += r["skipped"]
        total.failed += r["failed"]
        total.frames += r["frames"]
    out = dataclasses.asdict(total)
    dt = max(time.time() - t0, 1e-9)
    out["seconds"] = round(dt, 3)
    out["frames_per_sec"] = round(total.frames / dt, 2)
    return out


def missing_items(
    items: Sequence[Tuple[str, str]], out_root: str, num_extraction_frames: int = 8
) -> List[Tuple[str, str]]:
    """The 'loss list': items with any missing per-frame npz (reference drives
    re-extraction from pickled loss lists, :282-287)."""
    missing = []
    for video_id, video_path in items:
        d = os.path.join(out_root, video_id)
        if any(not os.path.exists(os.path.join(d, f"{s}.npz"))
               for s in range(num_extraction_frames)):
            missing.append((video_id, video_path))
    return missing
