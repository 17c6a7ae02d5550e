"""Transcode + remux driver tests: the executable mitigation for GOP-bound
archival sources (video_reader.transcode / tools/remux.py). The reference has
no equivalent — its readers re-pay the GOP cost every epoch
(base_dataset.py:503-527); oatx re-encodes once and decodes fast forever."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from oatx.data import video_reader as vr

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import remux  # noqa: E402


@pytest.fixture(scope="module")
def archival(tmp_path_factory):
    """An inter-coded 'archival' source (long GOP)."""
    root = tmp_path_factory.mktemp("src")
    p = str(root / "a.mp4")
    vr.write_test_video(p, width=160, height=128, num_frames=48, fps=8,
                        seed=5, codec="mpeg4", gop=48)
    return p


def test_transcode_preserves_frames(archival, tmp_path):
    n_src = vr.probe(archival)[0]
    for codec, ext in (("mjpeg", ".avi"), ("libx264", ".mp4")):
        out = str(tmp_path / f"out{ext}")
        n = vr.transcode(archival, out, codec=codec, gop=16)
        assert n == n_src, (codec, n, n_src)
        assert vr.probe(out)[0] == n_src
        # content survives the re-encode: same frame index → similar pixels
        src = vr.decode_indices(archival, [0, 10, 40])
        dst = vr.decode_indices(out, [0, 10, 40])
        err = np.abs(src.astype(np.int16) - dst.astype(np.int16)).mean()
        assert err < 16, (codec, err)  # lossy but near


def test_transcode_bad_input_raises(tmp_path):
    missing = str(tmp_path / "missing.mp4")
    with pytest.raises(vr.DecodeError):
        vr.transcode(missing, str(tmp_path / "o.avi"), codec="mjpeg")


def test_out_rel_paths_disambiguates_collisions():
    """a.mp4 + a.mkv must not map to the same output (two workers would race
    one tmp file and resume would silently drop a clip)."""
    rels = ["d/a.mp4", "d/a.mkv", "d/b.mp4"]
    m = remux.out_rel_paths(rels, "libx264")
    assert len(set(m.values())) == 3
    assert m["d/b.mp4"] == "d/b.mp4"  # no collision → plain swap
    assert sorted(m[r] for r in ("d/a.mp4", "d/a.mkv")) == [
        "d/a_mkv.mp4", "d/a_mp4.mp4"]
    # mjpeg flavor
    m2 = remux.out_rel_paths(["x.avi", "x.mov"], "mjpeg")
    assert sorted(m2.values()) == ["x_avi.avi", "x_mov.avi"]


def test_remux_driver_end_to_end(tmp_path):
    """CLI driver: scan → transcode → resume-skip on the second run."""
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    (src / "sub").mkdir(parents=True)
    for i, rel in enumerate(["one.mp4", "sub/two.mp4"]):
        vr.write_test_video(str(src / rel), width=96, height=64, num_frames=16,
                            fps=8, seed=i, codec="mpeg4", gop=16)
    env = dict(os.environ)
    env["OATX_PLATFORM"] = "cpu"
    cmd = [sys.executable, "tools/remux.py", "--src", str(src), "--dst",
           str(dst), "--codec", "mjpeg", "--workers", "1"]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r1 = subprocess.run(cmd, capture_output=True, text=True, cwd=repo,
                        env=env, timeout=300)
    assert r1.returncode == 0, r1.stderr[-800:]
    out1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert out1["transcoded"] == 2 and out1["failed"] == 0
    assert (dst / "one.avi").exists() and (dst / "sub" / "two.avi").exists()
    assert vr.probe(str(dst / "one.avi"))[0] == 16

    # second run: everything skipped (resume contract)
    r2 = subprocess.run(cmd, capture_output=True, text=True, cwd=repo,
                        env=env, timeout=300)
    out2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert out2["skipped_existing"] == 2 and out2["transcoded"] == 0


def test_remux_driver_records_failures(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    (src / "bad.mp4").write_bytes(b"not a video at all")
    env = dict(os.environ)
    env["OATX_PLATFORM"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "tools/remux.py", "--src", str(src), "--dst",
         str(dst), "--codec", "mjpeg", "--workers", "1"],
        capture_output=True, text=True, cwd=repo, env=env, timeout=300)
    assert r.returncode == 1
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["failed"] == 1
    loss = out["loss_list"]
    assert os.path.exists(loss)
    assert "bad.mp4" in open(loss).read()
