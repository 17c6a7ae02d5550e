"""Frame index sampling.

Reproduces the semantics of the reference sampler
(/root/reference/OATrans/base/base_dataset.py:465-480 `sample_frames`): the video is
split into `num_frames` equal intervals and one index is drawn per interval —
randomly ('rand'), at the interval midpoint ('uniform'), or at a fixed offset from the
interval start (`fix_start`).

Differences from the reference (deliberate):
  * randomness comes from an explicit `numpy.random.Generator` so the input pipeline is
    reproducible and shardable (the reference uses the global `random` module);
  * degenerate intervals (width < 2) fall back to the interval start instead of raising
    (the reference's `random.choice(range(a, b))` crashes when b <= a, e.g. for
    vlen == num_frames).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def sample_frames(
    num_frames: int,
    vlen: int,
    sample: str = "rand",
    fix_start: Optional[int] = None,
    rng: Optional[np.random.Generator] = None,
) -> List[int]:
    """Pick `min(num_frames, vlen)` frame indices in [0, vlen)."""
    if vlen <= 0:
        raise ValueError(f"vlen must be positive, got {vlen}")
    acc_samples = min(num_frames, vlen)
    intervals = np.linspace(start=0, stop=vlen, num=acc_samples + 1).astype(int)
    starts = intervals[:-1]
    # Interval is [start, next_start - 1]; matches reference `ranges`.
    ends = intervals[1:] - 1

    if fix_start is not None:
        idxs = starts + int(fix_start)
    elif sample == "rand":
        if rng is None:
            rng = np.random.default_rng()
        highs = np.maximum(ends, starts + 1)  # random.choice(range(s, e)) — e exclusive
        idxs = rng.integers(low=starts, high=highs)
    elif sample == "uniform":
        idxs = (starts + ends) // 2
    else:
        raise NotImplementedError(f"unknown sampling mode: {sample!r}")
    return [int(i) for i in np.clip(idxs, 0, vlen - 1)]


def aligned_object_frame_index(
    frame_idxs: Sequence[int], vlen: int, num_extraction_frames: int = 8
) -> int:
    """Index (into the extraction grid) of the object frame best aligned to a clip.

    The offline object extractor samples `num_extraction_frames` frames uniformly
    ('uniform' mode above). Object-aware dataset variants prepend the extraction frame
    closest to the clip's first sampled frame
    (/root/reference/OATrans/base/base_dataset_global_local.py:889-926 semantics).
    Returns the extraction-grid slot in [0, num_extraction_frames).
    """
    grid = sample_frames(num_extraction_frames, vlen, sample="uniform")
    anchor = frame_idxs[0] if len(frame_idxs) else 0
    diffs = [abs(g - anchor) for g in grid]
    return int(np.argmin(diffs))
