"""Host-side video decode: ctypes binding to the first-party C++ library.

Replaces the reference's cv2/decord/PyAV readers
(/root/reference/OATrans/base/base_dataset.py:503-552) with oatx's
FFmpeg-based native library (oatx/native/oatx_decode.cpp). Frames come back as
packed uint8 RGB HWC, optionally short-side-resized in native code; all further
augmentation/normalization happens on-device (oatx.data.transforms), keeping the
host→HBM transfer small (uint8) and the hot math on the TPU.

The decode call releases the GIL (ctypes foreign call), so a thread-pool loader
gets real parallelism without torch-style worker processes.

Hot path: `VideoHandle` (or `read_frames`, which uses one) — a single container
open serves probe + out_size + decode, and the native side skips the JPEG
decode of unsampled frames for intra-only codecs and color-converts only the
frames actually requested. v0.1→v0.2 cut a WebVid-like probe+4-frame decode
from ~47 to ~7 ms/clip (PERF.md "Host decode plane v2"); the path-based
functions below keep the old one-shot API on top of the same core.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

from oatx.data.sampling import sample_frames

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "liboatx_decode.so")

_lib = None


class DecodeError(RuntimeError):
    pass


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    inputs = [os.path.join(_NATIVE_DIR, f) for f in os.listdir(_NATIVE_DIR)
              if f.endswith((".cpp", ".h")) or f == "Makefile"]

    def _stale():
        return (os.path.exists(_LIB_PATH) and inputs
                and max(map(os.path.getmtime, inputs)) > os.path.getmtime(_LIB_PATH))

    # build on first use — and REBUILD when ANY build input (source, headers,
    # Makefile flags) is newer than the .so: the C ABI has grown arguments
    # (e.g. the fixture writer's seed) and ctypes silently drops extras, so a
    # stale library misbehaves without any error.
    # The staleness check, make, AND dlopen all run under one cross-process
    # exclusive lock: multi-process launches (tests, pod hosts sharing a
    # filesystem) must neither run `make` concurrently nor dlopen a
    # half-linked .so (the linker writes it in place over seconds, with an
    # mtime that already looks fresh — checking outside the lock is a TOCTOU).
    import fcntl
    with open(os.path.join(_NATIVE_DIR, ".build.lock"), "w") as lock_f:
        fcntl.flock(lock_f, fcntl.LOCK_EX)
        try:
            if not os.path.exists(_LIB_PATH) or _stale():
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
        finally:
            fcntl.flock(lock_f, fcntl.LOCK_UN)
    lib.oatx_probe.restype = ctypes.c_int
    lib.oatx_probe.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.oatx_out_size.restype = ctypes.c_int
    lib.oatx_out_size.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.oatx_decode_indices.restype = ctypes.c_int
    lib.oatx_decode_indices.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
    lib.oatx_open.restype = ctypes.c_void_p
    lib.oatx_open.argtypes = [ctypes.c_char_p]
    lib.oatx_close.restype = None
    lib.oatx_close.argtypes = [ctypes.c_void_p]
    lib.oatx_handle_info.restype = ctypes.c_int
    lib.oatx_handle_info.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.oatx_handle_out_size.restype = ctypes.c_int
    lib.oatx_handle_out_size.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.oatx_handle_decode.restype = ctypes.c_int
    lib.oatx_handle_decode.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
    lib.oatx_write_test_video.restype = ctypes.c_int
    lib.oatx_write_test_video.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint]
    lib.oatx_write_test_video_ex.restype = ctypes.c_int
    lib.oatx_write_test_video_ex.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint, ctypes.c_char_p, ctypes.c_int]
    lib.oatx_transcode.restype = ctypes.c_int64
    lib.oatx_transcode.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_int]
    lib.oatx_version.restype = ctypes.c_char_p
    _lib = lib
    return lib


def native_version() -> str:
    return _load_lib().oatx_version().decode()


class VideoHandle:
    """One open container serving probe + decode (the hot dataset path).

    The v0.1 path-based API reopened (and re-ran find_stream_info on) the file
    THREE times per clip read — probe, out_size, decode. A handle does it once;
    on the WebVid-like fixture that plus the decode-side skip work cut
    probe+decode from ~47 to ~7 ms/clip (PERF.md "Host decode plane v2").
    Use as a context manager; the underlying native object is not thread-safe —
    one handle per worker thread (the loader already samples clip-per-worker).
    """

    def __init__(self, path: str):
        self._lib = _load_lib()
        self._path = path
        self._h = self._lib.oatx_open(path.encode())
        if not self._h:
            raise DecodeError(f"open failed: {path}")

    def __enter__(self) -> "VideoHandle":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __del__(self):  # last-resort native cleanup off the context manager
        self.close()

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.oatx_close(self._h)
            self._h = None

    def _handle(self):
        if not self._h:  # NULL through ctypes would segfault in native code
            raise DecodeError(f"handle is closed: {self._path}")
        return self._h

    def info(self) -> Tuple[int, float, int, int]:
        """→ (num_frames, fps, width, height)."""
        nframes = ctypes.c_int64()
        fps = ctypes.c_double()
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = self._lib.oatx_handle_info(self._handle(), ctypes.byref(nframes),
                                        ctypes.byref(fps), ctypes.byref(w),
                                        ctypes.byref(h))
        if rc != 0:
            raise DecodeError(f"probe failed ({rc}): {self._path}")
        return int(nframes.value), float(fps.value), int(w.value), int(h.value)

    def out_size(self, short_side: int = 0) -> Tuple[int, int]:
        ow = ctypes.c_int()
        oh = ctypes.c_int()
        rc = self._lib.oatx_handle_out_size(self._handle(), short_side,
                                            ctypes.byref(ow), ctypes.byref(oh))
        if rc != 0:
            raise DecodeError(f"out_size failed ({rc}): {self._path}")
        return int(ow.value), int(oh.value)

    def decode(self, indices: Sequence[int], short_side: int = 0) -> np.ndarray:
        """Decode specific frame indices → uint8 (n, H, W, 3) RGB."""
        ow, oh = self.out_size(short_side)
        n = len(indices)
        out = np.empty((n, oh, ow, 3), dtype=np.uint8)
        idx_arr = np.asarray(indices, dtype=np.int64)
        rc = self._lib.oatx_handle_decode(
            self._handle(),
            idx_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, short_side,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ow, oh)
        if rc < 0:
            raise DecodeError(f"decode failed ({rc}): {self._path}")
        return out


def probe(path: str) -> Tuple[int, float, int, int]:
    """→ (num_frames, fps, width, height). Raises DecodeError on failure."""
    lib = _load_lib()
    nframes = ctypes.c_int64()
    fps = ctypes.c_double()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.oatx_probe(path.encode(), ctypes.byref(nframes), ctypes.byref(fps),
                        ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise DecodeError(f"probe failed ({rc}): {path}")
    return int(nframes.value), float(fps.value), int(w.value), int(h.value)


def decode_indices(path: str, indices: Sequence[int], short_side: int = 0) -> np.ndarray:
    """Decode specific frame indices → uint8 (n, H, W, 3) RGB."""
    with VideoHandle(path) as h:
        return h.decode(indices, short_side=short_side)


def read_frames(
    path: str,
    num_frames: int,
    sample: str = "rand",
    fix_start: Optional[int] = None,
    rng: Optional[np.random.Generator] = None,
    short_side: int = 256,
) -> Tuple[np.ndarray, List[int], int]:
    """Sample + decode: → (uint8 frames (n,H,W,3), frame_idxs, vlen).

    Mirrors reference read_frames_cv2/decord (sample_frames then fetch); decode
    errors raise DecodeError — dataset 'lax' loading catches and substitutes
    (reference base_dataset.py:101-108 semantics)."""
    with VideoHandle(path) as h:
        vlen, _, _, _ = h.info()
        if vlen <= 0:
            raise DecodeError(f"no frames: {path}")
        idxs = sample_frames(num_frames, vlen, sample=sample, fix_start=fix_start, rng=rng)
        frames = h.decode(idxs, short_side=short_side)
    return frames, idxs, vlen


def write_test_video(path: str, width: int = 128, height: int = 96,
                     num_frames: int = 32, fps: int = 8, seed: int = 0,
                     codec: str = "mjpeg", gop: int = 0) -> None:
    """Synthesize a fixture clip (tests/demos; no ffmpeg CLI needed).
    seed=0 is the historical pattern; nonzero seeds produce visually distinct
    content (pattern frequency/phase + chroma). codec='mjpeg' writes the
    historical intra-only AVI; 'mpeg4' / 'libx264' write inter-coded streams
    (keyframe interval `gop`) that exercise the decoder's seek-stepping path;
    the container follows the path extension for non-mjpeg codecs."""
    lib = _load_lib()
    rc = lib.oatx_write_test_video_ex(path.encode(), width, height, num_frames,
                                      fps, seed & 0xFFFFFFFF, codec.encode(), gop)
    if rc != 0:
        raise DecodeError(f"test video write failed ({rc}): {path} [{codec}]")


def transcode(in_path: str, out_path: str, codec: str = "libx264",
              gop: int = 60, quality: int = 0) -> int:
    """One-pass re-encode of a clip's video stream (same size/frame-rate,
    non-video streams dropped) — the executable mitigation for GOP-bound
    archival sources (PERF.md "Host decode plane v2": keyframe-seek decode
    cost scales with GOP length; gop-250 x264 ≈ 3 cores/chip vs ~1 at
    gop≤60, <1 for MJPEG). codec: 'libx264' (quality = crf, default 18) or
    'mjpeg' (quality = qscale, default 2; container forced to AVI). Returns
    the number of frames written. See tools/remux.py for the resumable
    corpus driver."""
    lib = _load_lib()
    n = lib.oatx_transcode(in_path.encode(), out_path.encode(), codec.encode(),
                           gop, quality)
    if n < 0:
        raise DecodeError(f"transcode failed ({n}): {in_path} -> {out_path}")
    return int(n)
