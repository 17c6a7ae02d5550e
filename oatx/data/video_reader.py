"""Host-side video decode: ctypes binding to the first-party C++ library.

Replaces the reference's cv2/decord/PyAV readers
(/root/reference/OATrans/base/base_dataset.py:503-552) with oatx's
FFmpeg-based native library (oatx/native/oatx_decode.cpp). Frames come back as
packed uint8 RGB HWC, optionally short-side-resized in native code; all further
augmentation/normalization happens on-device (oatx.data.transforms), keeping the
host→HBM transfer small (uint8) and the hot math on the TPU.

The decode call releases the GIL (ctypes foreign call), so a thread-pool loader
gets real parallelism without torch-style worker processes.
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
    stale = (os.path.exists(_LIB_PATH) and inputs
             and max(map(os.path.getmtime, inputs)) > os.path.getmtime(_LIB_PATH))
    if not os.path.exists(_LIB_PATH) or stale:
        # build on first use — and REBUILD when ANY build input (source,
        # headers, Makefile flags) is newer than the .so: the C ABI has grown
        # arguments (e.g. the fixture writer's seed) and ctypes silently drops
        # extras, so a stale library misbehaves without any error
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
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
    lib.oatx_write_test_video.restype = ctypes.c_int
    lib.oatx_write_test_video.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint]
    lib.oatx_version.restype = ctypes.c_char_p
    _lib = lib
    return lib


def native_version() -> str:
    return _load_lib().oatx_version().decode()


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
    lib = _load_lib()
    ow = ctypes.c_int()
    oh = ctypes.c_int()
    rc = lib.oatx_out_size(path.encode(), short_side, ctypes.byref(ow), ctypes.byref(oh))
    if rc != 0:
        raise DecodeError(f"open failed ({rc}): {path}")
    n = len(indices)
    out = np.empty((n, oh.value, ow.value, 3), dtype=np.uint8)
    idx_arr = np.asarray(indices, dtype=np.int64)
    rc = lib.oatx_decode_indices(
        path.encode(),
        idx_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, short_side,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ow.value, oh.value)
    if rc < 0:
        raise DecodeError(f"decode failed ({rc}): {path}")
    return out


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
    vlen, _, _, _ = probe(path)
    if vlen <= 0:
        raise DecodeError(f"no frames: {path}")
    idxs = sample_frames(num_frames, vlen, sample=sample, fix_start=fix_start, rng=rng)
    frames = decode_indices(path, idxs, short_side=short_side)
    return frames, idxs, vlen


def write_test_video(path: str, width: int = 128, height: int = 96,
                     num_frames: int = 32, fps: int = 8, seed: int = 0) -> None:
    """Synthesize an MJPEG/AVI fixture clip (tests/demos; no ffmpeg CLI needed).
    seed=0 is the historical pattern; nonzero seeds produce visually distinct
    content (pattern frequency/phase + chroma)."""
    lib = _load_lib()
    rc = lib.oatx_write_test_video(path.encode(), width, height, num_frames, fps,
                                   seed & 0xFFFFFFFF)
    if rc != 0:
        raise DecodeError(f"test video write failed ({rc}): {path}")
