"""Remux before/after decode A/B (VERDICT r3 #5 'Done' criterion).

Builds an archival-style corpus (x264, gop 250 — the x264 default that makes
keyframe-seek decode pay ~a full GOP per sampled frame), drives tools/remux.py
over it twice (→ gop-60 x264 and → MJPEG/AVI), then times the exact loader
decode path (read_frames: 4 uniform samples + short-side-256 canonicalize) on
all three corpora. Prints one JSON row per corpus:

    python tools/exp_remux_ab.py [--clips 32] [--len 300] [--res 320]

The reference eats the archival cost per frame forever (its readers seek per
sample, base_dataset.py:503-527); oatx's answer is a one-time native remux
whose cost is amortized across every epoch that follows — this experiment
records both the decode speedup and the one-time remux cost so the tradeoff
is checkable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)

from oatx.data import video_reader as vr  # noqa: E402


def time_decode(dirpath: str, num_frames: int = 4, reps: int = 2) -> dict:
    """Loader-path decode timing: 4 uniform frames + short_side=256, every
    clip in the dir; first rep warms the page cache and is discarded."""
    clips = sorted(
        os.path.join(dirpath, f) for f in os.listdir(dirpath)
        if f.endswith((".mp4", ".avi")))
    assert clips, dirpath
    rng = np.random.default_rng(0)
    best = None
    for rep in range(reps):
        t0 = time.perf_counter()
        for c in clips:
            frames, _, _ = vr.read_frames(c, num_frames, sample="uniform",
                                          rng=rng, short_side=256)
            assert frames.shape[0] == num_frames
        dt = time.perf_counter() - t0
        if rep > 0:
            best = dt if best is None else min(best, dt)
    return {"clips": len(clips), "sec": round(best, 3),
            "clips_per_sec_core": round(len(clips) / best, 1)}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--clips", type=int, default=32)
    p.add_argument("--len", type=int, default=300, dest="nframes")
    p.add_argument("--res", type=int, default=320)
    p.add_argument("--workdir", default="/tmp/remux_ab")
    args = p.parse_args(argv)

    src = os.path.join(args.workdir, "src")
    os.makedirs(src, exist_ok=True)
    for i in range(args.clips):
        path = os.path.join(src, f"clip{i:04d}.mp4")
        if not os.path.exists(path):
            vr.write_test_video(path, width=args.res, height=args.res * 3 // 4,
                                num_frames=args.nframes, fps=24, seed=i,
                                codec="libx264", gop=250)

    from tools.remux import main as remux_main

    plans = [("gop60", ["--codec", "libx264", "--gop", "60"]),
             ("mjpeg", ["--codec", "mjpeg"])]
    remux_rates = {}
    for name, extra in plans:
        dst = os.path.join(args.workdir, name)
        t0 = time.perf_counter()
        rc = remux_main(["--src", src, "--dst", dst, "--workers", "1"] + extra)
        assert rc == 0, f"remux {name} failed"
        remux_rates[name] = round(args.clips / (time.perf_counter() - t0), 1)

    rows = {"src_gop250": time_decode(src)}
    for name, _ in plans:
        rows[name] = time_decode(os.path.join(args.workdir, name))
    base = rows["src_gop250"]["clips_per_sec_core"]
    for name, row in rows.items():
        row["speedup_vs_src"] = round(row["clips_per_sec_core"] / base, 2)
        if name in remux_rates:
            row["remux_clips_per_sec_core"] = remux_rates[name]
        print(json.dumps({"corpus": name, **row}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
