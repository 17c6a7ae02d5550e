"""Native decoder unit tests: index selection, handle API, lax semantics.

The decoder replaces the reference's cv2/decord/PyAV readers
(/root/reference/OATrans/base/base_dataset.py:503-552): sample frame indices,
fetch exactly those frames, clamp out-of-range indices to the stream end (lax
loading). The fixture writer stamps each frame's index into the top-left 8x8
luma block (brightness 16 + 8*i), so frame ORDER is assertable from pixels;
index SELECTION is asserted byte-exactly against a dense full decode —
including through the intra-only packet-skip fast path, which must be
byte-identical to decoding everything.
"""

import numpy as np
import pytest

from oatx.data import video_reader as vr


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "clip.avi")
    vr.write_test_video(path, width=128, height=96, num_frames=32, fps=8, seed=3)
    return path


@pytest.fixture(scope="module")
def full(clip):
    """All 32 frames, native size — the oracle for index selection."""
    return vr.decode_indices(clip, list(range(32)))


def stampv(frame: np.ndarray) -> float:
    """Mean of the stamped 8x8 block (monotone in frame index, offset by a
    constant chroma term from the RGB conversion)."""
    return float(frame[2:6, 2:6, 1].mean())


def test_probe_and_out_size(clip):
    n, fps, w, h = vr.probe(clip)
    assert (n, w, h) == (32, 128, 96)
    assert fps == pytest.approx(8.0)


def test_full_decode_is_index_aligned(full):
    # the stamp brightens by 8 luma codes per frame: strictly increasing stamp
    # means frame i really is the i-th encoded frame (the writer's 16+8i luma
    # saturates at i=30, so check the unsaturated range)
    stamps = [stampv(f) for f in full[:30]]
    assert all(b - a > 3.0 for a, b in zip(stamps, stamps[1:]))


def test_decode_exact_indices(clip, full):
    idxs = [0, 5, 17, 31]
    frames = vr.decode_indices(clip, idxs)
    assert frames.shape == (4, 96, 128, 3) and frames.dtype == np.uint8
    for got, i in zip(frames, idxs):
        assert np.array_equal(got, full[i]), i


def test_decode_unsorted_and_duplicate_indices(clip, full):
    idxs = [20, 3, 20, 0]
    frames = vr.decode_indices(clip, idxs)
    for got, i in zip(frames, idxs):
        assert np.array_equal(got, full[i]), i


def test_out_of_range_lax_fills_last_frame(clip, full):
    # indices beyond the stream get the final stream frame, even when the
    # packet-skip path never wanted any in-range frame near the end
    frames = vr.decode_indices(clip, [2, 100])
    assert np.array_equal(frames[0], full[2])
    assert np.array_equal(frames[1], full[31])
    only_oor = vr.decode_indices(clip, [500, 501])
    assert np.array_equal(only_oor[0], full[31])
    assert np.array_equal(only_oor[1], full[31])


def test_short_side_resize_geometry(clip):
    frames = vr.decode_indices(clip, [1], short_side=64)
    # 128x96 → short side 96→64, long side 128*64/96 = 85 → even-floored 84
    assert frames.shape == (1, 64, 84, 3)


def test_handle_reuse_and_parity_with_path_api(clip):
    idxs = [4, 9, 9, 27, 100]
    via_path = vr.decode_indices(clip, idxs, short_side=64)
    with vr.VideoHandle(clip) as h:
        n, fps, w, hh = h.info()
        assert (n, w, hh) == (32, 128, 96)
        assert h.out_size(64) == (84, 64)
        first = h.decode(idxs, short_side=64)
        second = h.decode(idxs, short_side=64)  # re-decode rewinds the handle
        native_size = h.decode([0])
    assert np.array_equal(via_path, first)
    assert np.array_equal(first, second)
    assert native_size.shape == (1, 96, 128, 3)


def test_read_frames_roundtrip(clip):
    frames, idxs, vlen = vr.read_frames(clip, 4, sample="uniform", short_side=64)
    assert vlen == 32 and len(idxs) == 4
    oracle = vr.decode_indices(clip, idxs, short_side=64)
    assert np.array_equal(frames, oracle)


@pytest.mark.parametrize("codec,ext,gop", [
    ("mpeg4", ".mp4", 12),       # B-frames on: presentation-order reordering
    ("mpeg4", ".avi", 16),       # AVI+B-frames: pts unreliable → sequential path
    ("libx264", ".mp4", 16),     # the real WebVid codec
    ("mpeg2video", ".mp4", 15),  # B-frames, a third codec family
])
def test_inter_codec_seek_decode_matches_sequential(tmp_path, codec, ext, gop):
    """Inter-coded streams (keyframe-seek stepping path) must be byte-identical
    to a dense sequential decode of the same file — including lax clamping of
    out-of-range indices and duplicate indices."""
    p = str(tmp_path / f"clip{ext}")
    vr.write_test_video(p, 192, 144, 120, fps=12, seed=5, codec=codec, gop=gop)
    n, fps, w, h = vr.probe(p)
    assert (n, w, h) == (120, 192, 144)
    full = vr.decode_indices(p, list(range(120)))
    for idxs in ([7, 40, 41, 99], [119], [55, 300], [90, 3], [17, 17, 64], [300, 301]):
        got = vr.decode_indices(p, idxs)
        for g, i in zip(got, idxs):
            assert np.array_equal(g, full[min(i, 119)]), (codec, ext, idxs, i)
    with vr.VideoHandle(p) as hd:
        a = hd.decode([7, 40, 99], short_side=64)
        b = hd.decode([7, 40, 99], short_side=64)
    assert np.array_equal(a, b)


@pytest.mark.parametrize("codec,ext", [
    ("libx264", ".mp4"), ("mpeg4", ".mp4"), ("mjpeg", ".avi")])
def test_single_frame_clip_decodes(tmp_path, codec, ext):
    """Regression: the fixture writer must stamp packet durations — without
    them a 1-packet mp4 gets edit-list duration 0 and the demuxer DISCARDs its
    only sample (every decoder then outputs nothing)."""
    p = str(tmp_path / f"one{ext}")
    vr.write_test_video(p, 128, 96, 1, fps=8, seed=1, codec=codec, gop=10)
    frames = vr.decode_indices(p, [0, 5])  # 5 lax-clamps to the only frame
    assert frames.shape == (2, 96, 128, 3)
    assert np.array_equal(frames[0], frames[1])


def test_fuzz_random_geometry_and_indices(tmp_path):
    """Bounded fuzz: random clip geometry / gop / fps / index sets across all
    codec paths must match the clamped-index oracle byte-exactly. (A 60-trial
    sweep of this generator runs clean; this keeps an 8-trial canary in CI.)"""
    rng = np.random.default_rng(7)
    for trial in range(8):
        codec, ext = [("mjpeg", ".avi"), ("mpeg4", ".mp4"),
                      ("libx264", ".mp4"), ("mpeg4", ".avi")][trial % 4]
        nf = int(rng.integers(1, 60))
        w = int(rng.integers(3, 12)) * 16
        h = int(rng.integers(3, 10)) * 16
        gop = int(rng.integers(1, 25))
        fps = int(rng.integers(5, 31))
        p = str(tmp_path / f"f{trial}{ext}")
        vr.write_test_video(p, w, h, nf, fps=fps, seed=trial, codec=codec, gop=gop)
        full = vr.decode_indices(p, list(range(nf)))
        assert full.shape[0] == nf
        for _ in range(3):
            k = int(rng.integers(1, 9))
            idxs = rng.integers(0, nf + 20, k).tolist()
            got = vr.decode_indices(p, idxs)
            oracle = full[[min(i, nf - 1) for i in idxs]]
            assert np.array_equal(got, oracle), (codec, ext, nf, gop, idxs)


def test_open_missing_file_raises(tmp_path):
    with pytest.raises(vr.DecodeError):
        vr.probe(str(tmp_path / "nope.avi"))
    with pytest.raises(vr.DecodeError):
        vr.VideoHandle(str(tmp_path / "nope.avi"))
