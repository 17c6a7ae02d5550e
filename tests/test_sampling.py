import numpy as np
import pytest

from oatx.data.sampling import aligned_object_frame_index, sample_frames


def _reference_intervals(num_frames, vlen):
    acc = min(num_frames, vlen)
    intervals = np.linspace(start=0, stop=vlen, num=acc + 1).astype(int)
    return [(intervals[i], intervals[i + 1] - 1) for i in range(acc)]


@pytest.mark.parametrize("num_frames,vlen", [(4, 100), (8, 30), (1, 7), (4, 4), (8, 3)])
def test_uniform_matches_reference_midpoints(num_frames, vlen):
    got = sample_frames(num_frames, vlen, sample="uniform")
    want = [(a + b) // 2 for a, b in _reference_intervals(num_frames, vlen)]
    assert got == want


def test_fix_start_matches_reference():
    got = sample_frames(4, 100, fix_start=3)
    want = [a + 3 for a, _ in _reference_intervals(4, 100)]
    assert got == want


def test_rand_within_intervals(rng):
    for _ in range(20):
        idxs = sample_frames(4, 103, sample="rand", rng=rng)
        assert len(idxs) == 4
        for idx, (a, b) in zip(idxs, _reference_intervals(4, 103)):
            assert a <= idx <= b


def test_rand_is_reproducible():
    a = sample_frames(8, 997, sample="rand", rng=np.random.default_rng(42))
    b = sample_frames(8, 997, sample="rand", rng=np.random.default_rng(42))
    assert a == b


def test_short_video_returns_vlen_frames():
    assert len(sample_frames(8, 3, sample="rand", rng=np.random.default_rng(0))) == 3


def test_indices_in_range():
    idxs = sample_frames(8, 9, sample="uniform")
    assert all(0 <= i < 9 for i in idxs)


def test_aligned_object_frame_index():
    # extraction grid of 8 uniform frames over vlen=80: midpoints 4,14,...,74
    idx = aligned_object_frame_index([33], vlen=80, num_extraction_frames=8)
    assert idx == 3  # 34 is the closest grid point to 33
    assert aligned_object_frame_index([0], 80) == 0
    assert aligned_object_frame_index([79], 80) == 7
