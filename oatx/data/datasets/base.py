"""Dataset base classes (host data plane).

One unified TextVideoDataset replaces the reference's three near-duplicate base
hierarchies (base_dataset.py / base_dataset_global_local.py /
base_dataset_region_mem.py — ~2.8k LoC of copy-paste variants): the object-aware
behaviors are explicit options selected by the experiment variant.

Samples are plain numpy dicts with *fixed shapes* (canonical uint8 frames, padded
object tensors) so batches collate by stacking and ship straight to device; all
float augmentation runs on-TPU (oatx.data.transforms).

Subclass hooks (same contract as the reference, base_dataset.py:56-66):
    _load_metadata()            → populate self.metadata (list of records)
    _get_video_path(rec)        → (abs_path, rel_path)
    _get_caption(rec, rng)      → str
    _get_object_path(rec, idx)  → abs path of the frame-idx object npz
"""

from __future__ import annotations

import dataclasses
import os
import random
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from oatx.config.schema import DataLoaderCfg
from oatx.data import objects as obj
from oatx.data import video_reader as vr
from oatx.data.sampling import aligned_object_frame_index, sample_frames
from oatx.data.transforms import host_canonicalize


@dataclasses.dataclass
class ObjectOptions:
    """What object-aware extras a sample carries (selected by model variant)."""
    tags: bool = False              # append object-tag text → pad_text
    tags_top_k: int = 20
    features: bool = False          # (top_k, 2054) ROI features
    features_top_k: int = 10
    unique_classes: bool = False
    patch_masks: bool = False       # (num_mask_objects, patch_rows²) masks of object frame
    num_mask_objects: int = 5
    patch_rows: int = 14            # model patch grid = input_res // patch_size
    object_frame: bool = False      # decode + emit the aligned extraction frame
    region_memory: Optional[obj.RegionMemoryBank] = None  # CLIP rows per class
    extraction_frames: int = 8      # offline extractor grid size
    pseudo_labels: bool = False


class TextVideoDataset:
    is_video = True

    def __init__(
        self,
        cfg: DataLoaderCfg,
        split: Optional[str] = None,
        object_options: Optional[ObjectOptions] = None,
        object_vocab: Optional[Sequence[str]] = None,
        canon: int = 256,
        sliding_window_stride: int = -1,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.dataset_name = cfg.dataset_name
        self.data_dir = cfg.data_dir
        self.object_dir = cfg.object_dir
        self.metadata_dir = cfg.metadata_dir or cfg.data_dir
        self.split = split or cfg.split
        self.cut = cfg.cut
        self.subsample = cfg.subsample
        self.text_params = cfg.text_params
        self.object_params = cfg.object_params
        self.video_params = cfg.video_params
        self.num_frames = cfg.num_frames
        self.canon = canon
        # train_crop: 'device_canonical' (default — device RRC from the
        # canonical center square; documented divergence in data/transforms.py)
        # or 'reference_full_frame' (host-side torchvision-exact
        # RandomResizedCrop over the FULL decoded frame; ships input_res²
        # frames and the device augmenter skips its crop — the ablation lane
        # for the crop divergence).
        self.train_crop = (cfg.video_params or {}).get(
            "train_crop", "device_canonical")
        assert self.train_crop in ("device_canonical", "reference_full_frame"), \
            f"unknown train_crop {self.train_crop!r}"
        self.train_crop_res = int((cfg.video_params or {}).get("input_res", 224))
        if self.train_crop == "reference_full_frame":
            # baseline-ablation lane only: object frames / patch masks are
            # rasterized on the canonical geometry, and mixed frame sizes
            # would break the shared device augmenter
            o = object_options
            assert o is None or not (o.object_frame or o.patch_masks), (
                "train_crop='reference_full_frame' supports the baseline "
                "variant only (object_frame/patch_masks need the canonical "
                "crop geometry)")
        self.loading = cfg.loading  # 'strict' | 'lax'
        self.opts = object_options or ObjectOptions()
        self.object_vocab = list(object_vocab) if object_vocab else None
        self.sliding_window_stride = sliding_window_stride
        self.seed = seed
        self.metadata: List[Any] = []
        self._load_metadata()
        if self.subsample < 1 and len(self.metadata):
            rng = np.random.default_rng(seed)
            keep = max(1, int(len(self.metadata) * self.subsample))
            idx = rng.permutation(len(self.metadata))[:keep]
            self.metadata = [self.metadata[i] for i in sorted(idx)]

    # ------------------------------------------------------------- hooks

    def _load_metadata(self):
        raise NotImplementedError

    def _get_video_path(self, rec) -> Tuple[str, str]:
        raise NotImplementedError

    def _get_caption(self, rec, rng: np.random.Generator) -> str:
        raise NotImplementedError

    def _get_object_path(self, rec, frame_index: int = 0) -> str:
        rel = self._get_video_rel_stem(rec)
        return os.path.join(self.object_dir, rel, f"{frame_index}.npz")

    def _get_video_rel_stem(self, rec) -> str:
        path, rel = self._get_video_path(rec)
        return os.path.splitext(rel)[0]

    # ------------------------------------------------------------- core

    def __len__(self):
        return len(self.metadata)

    def expand_sliding_windows(self, stride: int) -> None:
        """Explode each video into multiple fixed-start windows for eval-time
        temporal ensembling (reference _fix_temporal_samples,
        base_dataset.py:75-82; the reference's `len(x - 1)` divides by F+1 — an
        off-by-one — we use the intended interval width vlen // F).

        After expansion each record carries 'fix_start' and 'window_group'; the
        evaluator means video embeddings per group (test.py:243-266)."""
        assert stride > 0
        self.sliding_window_stride = stride
        expanded: List[Any] = []
        for gid, rec in enumerate(self.metadata):
            try:
                vlen, _, _, _ = vr.probe(self._get_video_path(rec)[0])
            except vr.DecodeError:
                vlen = self.num_frames
            width = max(1, vlen // max(1, min(vlen, self.num_frames)))
            for fs in range(0, width, stride):
                r = dict(rec)
                r["fix_start"] = int(fs)
                r["window_group"] = gid
                expanded.append(r)
        self.metadata = expanded

    def expand_eval_captions(self, queries_per_video: Optional[int] = None) -> int:
        """Explode each multi-caption record into one row per caption slot for the
        full-cut eval protocol (MSR-VTT full-val/full-test: ~20 captions/video;
        reference metric.py:16-120 consumes the resulting pseudo-rectangular sims
        with query masks for videos with fewer captions).

        Rows gain caption_group (video index) and caption_valid (0 for padded
        slots of videos with fewer captions). Returns queries_per_video."""
        qpv = queries_per_video or max(
            len(rec.get("captions", [None])) for rec in self.metadata)
        expanded: List[Any] = []
        for gid, rec in enumerate(self.metadata):
            caps = rec.get("captions")
            if caps is None:
                caps = [rec.get("caption", "")]
            for ci in range(qpv):
                r = dict(rec)
                valid = ci < len(caps)
                r["captions"] = [caps[ci] if valid else caps[0]]
                r["caption_group"] = gid
                r["caption_valid"] = int(valid)
                expanded.append(r)
        self.metadata = expanded
        return qpv

    def _frame_sample_mode(self) -> str:
        return "uniform" if self.split == "test" else "rand"

    def _host_rrc_active(self) -> bool:
        return self.train_crop == "reference_full_frame" and self.split == "train"

    def _frame_res(self) -> int:
        """Emitted frame size: input_res under the host-faithful train crop
        (frames are pre-cropped), the canonical square otherwise."""
        if self._host_rrc_active():
            return self.train_crop_res
        return self.canon

    def _finalize_frames(self, frames: np.ndarray,
                         rng: np.random.Generator) -> np.ndarray:
        """Shared host-side finish for every reader (video, still image, tar
        member): torchvision-exact RRC over the full decoded frame under the
        reference_full_frame lane, canonical square otherwise — so image
        datasets (CC3M) honor the ablation lane too, keeping frame shapes
        consistent across all train loaders (the trainer requires the lane on
        ALL of them)."""
        if self._host_rrc_active():
            from oatx.data.transforms import host_reference_rrc

            return host_reference_rrc(frames, rng, out=self.train_crop_res)
        return host_canonicalize(frames, self.canon)

    def _black_frames(self, n: int) -> np.ndarray:
        r = self._frame_res()
        return np.zeros((n, r, r, 3), np.uint8)

    def _read_video(self, path: str, rng: np.random.Generator,
                    fix_start: Optional[int] = None):
        # host-faithful lane: decode NATIVE size (short_side=0),
        # torchvision-exact RRC over the full frame (per-clip box, seeded
        # rng), ship input_res²; default: canonical short-side decode + crop
        frames, idxs, vlen = vr.read_frames(
            path, self.num_frames, sample=self._frame_sample_mode(),
            fix_start=fix_start, rng=rng,
            short_side=0 if self._host_rrc_active() else self.canon)
        frames = self._finalize_frames(frames, rng)
        if frames.shape[0] < self.num_frames:  # short video → repeat last frame
            pad = np.repeat(frames[-1:], self.num_frames - frames.shape[0], axis=0)
            frames = np.concatenate([frames, pad], axis=0)
        return frames, idxs, vlen

    def get_sample(self, index: int, rng: Optional[np.random.Generator] = None,
                   _depth: int = 0) -> Dict[str, Any]:
        """Load one sample. 'lax' loading substitutes a deterministic other item on
        decode failure (reference resample-random-item, bounded here); 'strict'
        raises."""
        if rng is None:
            rng = np.random.default_rng((self.seed, index))
        index = index % len(self.metadata)
        rec = self.metadata[index]
        video_fp, rel_fp = self._get_video_path(rec)
        caption = self._get_caption(rec, rng)

        fix_start = None
        if self.sliding_window_stride != -1 and isinstance(rec, dict):
            fix_start = rec.get("fix_start")

        try:
            frames, idxs, vlen = self._read_video(video_fp, rng, fix_start)
        except (vr.DecodeError, AssertionError, OSError) as e:
            if self.loading == "strict":
                raise ValueError(
                    f"Video loading failed for {video_fp}, strict mode") from e
            if _depth >= 8:  # give up: black frames (reference zero-pad fallback)
                frames, idxs, vlen = self._black_frames(self.num_frames), [0] * self.num_frames, 1
            else:
                return self.get_sample(int(rng.integers(0, len(self.metadata))),
                                       rng, _depth + 1)

        sample: Dict[str, Any] = {
            "video": frames,
            "text": caption,
            "meta": {"raw_captions": caption, "paths": rel_fp,
                     "dataset": self.dataset_name, "index": index},
        }
        if isinstance(rec, dict) and "window_group" in rec:
            sample["meta"]["window_group"] = rec["window_group"]
        if isinstance(rec, dict) and "caption_group" in rec:
            sample["meta"]["caption_group"] = rec["caption_group"]
            sample["meta"]["caption_valid"] = rec["caption_valid"]
        self._add_object_extras(sample, rec, idxs, vlen, rng)
        return sample

    # alias so the dataset quacks like a torch map-style dataset
    def __getitem__(self, index: int) -> Dict[str, Any]:
        return self.get_sample(index)

    def _add_object_extras(self, sample, rec, frame_idxs, vlen, rng) -> None:
        o = self.opts
        if not (o.tags or o.features or o.patch_masks or o.object_frame or
                o.region_memory is not None or o.pseudo_labels):
            return
        grid_slot = aligned_object_frame_index(frame_idxs, max(vlen, 1), o.extraction_frames)
        object_fp = self._get_object_path(rec, grid_slot)

        if o.object_frame:
            # decode the aligned extraction-grid frame as the object frame
            grid = sample_frames(o.extraction_frames, max(vlen, 1), sample="uniform")
            try:
                of = vr.decode_indices(self._get_video_path(rec)[0],
                                       [grid[grid_slot]], short_side=self.canon)
                sample["object_frame"] = host_canonicalize(of, self.canon)
            except vr.DecodeError:
                sample["object_frame"] = self._black_frames(1)

        loaded = obj.read_bboxes_and_ids(object_fp, top_k=o.tags_top_k)
        if loaded is None:
            bboxes = np.zeros((o.tags_top_k, 6), np.float32)
            class_ids = np.zeros((o.tags_top_k,), np.int64)
        else:
            bboxes, class_ids = loaded
            class_ids = class_ids.astype(np.int64)

        if o.tags:
            # np.unique's ascending-class-id ordering reproduces the reference's
            # tag ordering quirk (read_object_tags_from_disk, base_dataset.py:584-589)
            vocab = self.object_vocab or []
            uniq = np.unique(class_ids)[: o.tags_top_k]
            tags = ""
            for cid in uniq:
                name = vocab[int(cid) + 1] if vocab and int(cid) + 1 < len(vocab) else f"obj{cid}"
                tags += " " + name
            sample["pad_text"] = sample["text"] + tags
            # fixed-size id list for token-span computation; -1 = padding slot
            padded = np.full((o.tags_top_k,), -1, np.int64)
            padded[: len(uniq)] = uniq
            sample["tag_class_ids"] = padded

        if o.features:
            sample["object"] = obj.read_object_features(
                object_fp, top_k=o.features_top_k, unique_classes=o.unique_classes)

        if o.patch_masks:
            k = o.num_mask_objects
            n_avail = len(bboxes)
            pick = rng.permutation(n_avail)[:k] if n_avail >= k else np.arange(n_avail)
            picked = bboxes[pick]
            if len(picked) < k:
                picked = np.concatenate(
                    [picked, np.zeros((k - len(picked), 6), np.float32)], axis=0)
            sample["patch_masks"] = obj.patch_masks_from_bboxes(picked, patch_rows=o.patch_rows)
            sample["picked_class_ids"] = (
                class_ids[pick] if n_avail >= k else
                np.concatenate([class_ids[pick], np.zeros(k - n_avail, np.int64)]))

        if o.region_memory is not None:
            ids = sample.get("picked_class_ids")
            if ids is None:
                ids = class_ids[: o.num_mask_objects]
            sample["text_region_embedding"] = o.region_memory.lookup(ids)

        if o.pseudo_labels:
            sample["pseudo_labels"] = obj.pseudo_label_vector(object_fp)


class TextImageDataset(TextVideoDataset):
    """Image datasets (CC3M): 1-frame degenerate path — the native decoder reads
    stills (jpg/png) through the same FFmpeg path."""

    is_video = False

    def _read_video(self, path: str, rng, fix_start=None):
        frames = vr.decode_indices(
            path, [0], short_side=0 if self._host_rrc_active() else self.canon)
        return self._finalize_frames(frames, rng), [0], 1


class TextImageTarDataset(TextImageDataset):
    """Images packed in tar shards (reference TextImageTarDataset,
    base_dataset.py:408-416): per-thread tar handles (the reference isolates
    handles per torch worker process; oatx's loader is thread-based, so handles
    live in threading.local), members addressed as '<shard>.tar/<member>'.
    """

    def __init__(self, *args, **kwargs):
        import threading

        self._tls = threading.local()
        super().__init__(*args, **kwargs)

    def _tar_handle(self, tar_path: str):
        import tarfile

        cache = getattr(self._tls, "tars", None)
        if cache is None:
            cache = self._tls.tars = {}
        if tar_path not in cache:
            cache[tar_path] = tarfile.open(tar_path, "r")
        return cache[tar_path]

    def _read_video(self, path: str, rng, fix_start=None):
        # path format: /abs/dir/<shard>.tar/<member...>
        if ".tar/" not in path:
            return super()._read_video(path, rng, fix_start)
        tar_path, member = path.split(".tar/", 1)
        tar_path += ".tar"
        try:
            tf = self._tar_handle(tar_path)
            data = tf.extractfile(member)
            if data is None:
                raise vr.DecodeError(f"tar member missing: {path}")
            frame = self._decode_image_bytes(data.read())
        except (KeyError, OSError, Exception) as e:
            if isinstance(e, vr.DecodeError):
                raise
            raise vr.DecodeError(f"tar read failed: {path}: {e}") from e
        return self._finalize_frames(frame[None], rng), [0], 1

    def _decode_image_bytes(self, data: bytes) -> np.ndarray:
        import io

        from PIL import Image

        im = Image.open(io.BytesIO(data)).convert("RGB")
        if not self._host_rrc_active():  # the RRC lane wants the native size
            w, h = im.size
            scale = self.canon / min(w, h)
            im = im.resize((max(self.canon, int(w * scale)),
                            max(self.canon, int(h * scale))), Image.BILINEAR)
        return np.asarray(im, np.uint8)
