import json
import os

import numpy as np
import pytest

from oatx.data import extraction as ex
from oatx.data import objects as obj
from oatx.data import video_reader as vr


@pytest.fixture(scope="module")
def clips(tmp_path_factory):
    root = tmp_path_factory.mktemp("extract")
    items = []
    for i in range(4):
        p = root / f"v{i}.avi"
        vr.write_test_video(str(p), 96, 64, 20 + i * 4, 8)
        items.append((f"v{i}", str(p)))
    return root, items


def test_extract_video_writes_npz(clips, tmp_path):
    root, items = clips
    vid, path = items[0]
    out = tmp_path / "obj" / vid
    written, skipped = ex.extract_video(path, str(out), ex.StubDetector(), 8)
    assert written == 8 and skipped == 0
    # resumable: second run skips everything
    written2, skipped2 = ex.extract_video(path, str(out), ex.StubDetector(), 8)
    assert written2 == 0 and skipped2 == 8
    # output consumable by the training-side readers
    feats = obj.read_object_features(str(out / "0.npz"), top_k=5)
    assert feats.shape == (5, 2054)
    assert not np.all(feats == 1.0)  # real content, not the missing-file fallback


def test_extract_dataset_parallel(clips, tmp_path):
    root, items = clips
    out = tmp_path / "objs"
    stats = ex.extract_dataset(items, str(out), num_workers=3,
                               num_extraction_frames=4)
    assert stats["processed"] == 4 and stats["failed"] == 0
    assert stats["frames"] == 16
    assert stats["frames_per_sec"] > 0
    assert not ex.missing_items(items, str(out), 4)


def test_missing_items_loss_list(clips, tmp_path):
    root, items = clips
    out = tmp_path / "objs2"
    ex.extract_dataset(items[:2], str(out), num_workers=2, num_extraction_frames=4)
    missing = ex.missing_items(items, str(out), 4)
    assert [m[0] for m in missing] == ["v2", "v3"]
    # corrupt one frame npz → back on the loss list
    os.remove(out / "v0" / "2.npz")
    missing = ex.missing_items(items, str(out), 4)
    assert "v0" in [m[0] for m in missing]


def test_extract_cli(clips, tmp_path, capsys):
    from oatx.cli.extract import main

    root, items = clips
    lst = tmp_path / "items.tsv"
    lst.write_text("".join(f"{v}\t{p}\n" for v, p in items))
    rc = main(["--list", str(lst), "--out", str(tmp_path / "o"),
               "--workers", "2", "--frames", "2"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["processed"] == 4

    rc = main(["--list", str(lst), "--out", str(tmp_path / "o"),
               "--frames", "2", "--missing-only"])
    assert rc == 0
    assert capsys.readouterr().out.strip() == ""  # nothing missing


def test_stub_detector_deterministic(clips):
    root, items = clips
    frames = vr.decode_indices(items[0][1], [0])
    d = ex.StubDetector()
    a = d(frames[0])
    b = d(frames[0])
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_extract_video_shorter_than_grid(tmp_path):
    """Clips with fewer frames than the extraction grid repeat their last
    frame instead of IndexError-ing (which made the resumable pipeline retry
    them forever)."""
    from oatx.data import video_reader as vr
    from oatx.data.extraction import extract_video

    p = tmp_path / "short.avi"
    vr.write_test_video(str(p), 64, 48, 5, 8)  # 5 frames < 8-slot grid
    out = tmp_path / "out"
    out.mkdir()

    def fake_detector(frame):
        k = 3
        return (np.ones((k, 2048), np.float32),
                np.tile(np.array([1, 1, 30, 30], np.float32), (k, 1)),
                np.arange(k), np.linspace(0.9, 0.5, k).astype(np.float32))

    written, skipped = extract_video(str(p), str(out), fake_detector,
                                     num_extraction_frames=8)
    assert written == 8
    assert sorted(f.name for f in out.iterdir()) == [f"{i}.npz" for i in range(8)]
