"""Resumable corpus re-GOP/transcode driver (the executable mitigation for
GOP-bound archival decode cost — PERF.md "Host decode plane v2").

The decoder's keyframe-seek stepping pays for every frame from the nearest
preceding keyframe, so per-clip decode cost is driven by GOP length: x264
gop-250 material costs ~3 CPU cores/chip in the training input pipeline vs
~1 core at gop<=60 and <1 for MJPEG. This tool performs the one-time
re-encode over a corpus, with the resume/loss-list discipline of the
reference's ObjectExtractor (skips existing outputs, records failures —
ObjectExtractor/...webvid...py:165-176,282-287):

    python tools/remux.py --src /data/webvid/videos --dst /data/webvid/gop60 \
        [--worklist paths.txt] [--codec libx264 --gop 60 | --codec mjpeg] \
        [--workers 4] [--loss-list remux_failures.txt]

* --worklist: file of src-relative clip paths (default: scan --src for
  common video extensions).
* Resume: outputs that already exist non-empty are skipped, so the job can
  be re-driven after interruption; a second run over a completed corpus is
  a fast no-op.
* Failures are logged to --loss-list (one src-relative path per line) and do
  not stop the run; re-drive with `--worklist <loss-list>` after triage.
* Outputs mirror the src tree under --dst; mjpeg forces the .avi container
  (intra-only: the decoder's packet-skip fast path applies).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor, as_completed

_sys_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _sys_dir)

VIDEO_EXTS = (".mp4", ".avi", ".mkv", ".mov", ".webm", ".mpg", ".mpeg", ".m4v")


def scan_worklist(src_root: str) -> list:
    out = []
    for dirpath, _dirnames, filenames in os.walk(src_root):
        for f in filenames:
            if f.lower().endswith(VIDEO_EXTS):
                out.append(os.path.relpath(os.path.join(dirpath, f), src_root))
    out.sort()
    return out


def out_rel_path(rel: str, codec: str) -> str:
    base, _ext = os.path.splitext(rel)
    return base + (".avi" if codec == "mjpeg" else ".mp4")


def out_rel_paths(rels: list, codec: str) -> dict:
    """rel → output rel, disambiguating stems that collide after the
    extension swap (a.mp4 + a.mkv would otherwise both map to a.mp4 — two
    workers racing one tmp file, and resume silently dropping one clip).
    Colliding sources keep their original extension in the stem (a.mkv →
    a_mkv.mp4)."""
    plain = {}
    for rel in rels:
        plain.setdefault(out_rel_path(rel, codec), []).append(rel)
    out = {}
    for dst, group in plain.items():
        if len(group) == 1:
            out[group[0]] = dst
        else:
            for rel in group:
                base, ext = os.path.splitext(rel)
                out[rel] = out_rel_path(base + "_" + ext.lstrip("."), codec)
    return out


def _transcode_one(args) -> tuple:
    """(rel, ok, n_frames_or_error, seconds). Runs in a worker process."""
    src_root, dst_root, rel, out_rel, codec, gop, quality = args
    from oatx.data import video_reader as vr

    src = os.path.join(src_root, rel)
    dst = os.path.join(dst_root, out_rel)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    # keep the extension so libavformat can guess the container from the name
    base, ext = os.path.splitext(dst)
    tmp = base + ".tmp" + ext
    t0 = time.perf_counter()
    try:
        n = vr.transcode(src, tmp, codec=codec, gop=gop, quality=quality)
        os.replace(tmp, dst)  # atomic commit — a crash never leaves a
        # half-written clip where the resume check would skip it
        return rel, True, n, time.perf_counter() - t0
    except Exception as e:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return rel, False, str(e)[:200], time.perf_counter() - t0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--src", required=True, help="source corpus root")
    p.add_argument("--dst", required=True, help="output root (tree mirrored)")
    p.add_argument("--worklist", help="file of src-relative paths (default: scan)")
    p.add_argument("--codec", default="libx264", choices=["libx264", "mjpeg"])
    p.add_argument("--gop", type=int, default=60)
    p.add_argument("--quality", type=int, default=0,
                   help="crf for libx264 (default 18), qscale for mjpeg (default 2)")
    p.add_argument("--workers", type=int, default=max(1, (os.cpu_count() or 2) - 1))
    p.add_argument("--loss-list", default=None,
                   help="append failed src-relative paths here "
                        "(default: <dst>/remux_failures.txt)")
    p.add_argument("--limit", type=int, default=0, help="stop after N clips (smoke)")
    args = p.parse_args(argv)

    if args.worklist:
        with open(args.worklist) as f:
            rels = [ln.strip() for ln in f if ln.strip()]
    else:
        rels = scan_worklist(args.src)
    if args.limit:
        rels = rels[: args.limit]

    # resume: skip outputs that already exist non-empty
    out_map = out_rel_paths(rels, args.codec)
    todo = []
    skipped = 0
    for rel in rels:
        dst = os.path.join(args.dst, out_map[rel])
        if os.path.exists(dst) and os.path.getsize(dst) > 0:
            skipped += 1
        else:
            todo.append(rel)

    loss_list = args.loss_list or os.path.join(args.dst, "remux_failures.txt")
    os.makedirs(args.dst, exist_ok=True)
    done = failed = 0
    frames = 0
    t_start = time.perf_counter()
    jobs = [(args.src, args.dst, rel, out_map[rel], args.codec, args.gop,
             args.quality) for rel in todo]
    with ProcessPoolExecutor(max_workers=args.workers) as ex:
        futures = [ex.submit(_transcode_one, j) for j in jobs]
        for fut in as_completed(futures):
            rel, ok, info, secs = fut.result()
            if ok:
                done += 1
                frames += info
            else:
                failed += 1
                with open(loss_list, "a") as f:
                    f.write(rel + "\n")
                print(f"FAIL {rel}: {info}", file=sys.stderr)
            if (done + failed) % 50 == 0:
                rate = (done + failed) / (time.perf_counter() - t_start)
                print(f"... {done + failed}/{len(todo)} ({rate:.1f} clips/s)",
                      file=sys.stderr)
    dt = time.perf_counter() - t_start
    print(json.dumps({
        "total": len(rels), "skipped_existing": skipped, "transcoded": done,
        "failed": failed, "frames": frames,
        "clips_per_sec": round(done / dt, 2) if dt > 0 else None,
        "loss_list": loss_list if failed else None,
    }))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
