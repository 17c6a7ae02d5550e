"""Host decode-plane benchmark: frames/s and clips/s of the native FFmpeg
decoder through the real dataset+loader path.

Context: the reference's offline extraction pipeline sustained ~1.14 frames/s
per V100 (BASELINE.md) and its training input was cv2 seek-decode per worker
process; this measures oatx's thread-pool + first-party decoder equivalent.

    python tools/bench_decode.py [--clips 64] [--workers 8] [--frames 4]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--clips", type=int, default=64)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--res", type=int, default=320, help="fixture clip resolution")
    p.add_argument("--len", type=int, default=64, help="fixture frames per clip")
    p.add_argument("--codec", default="mjpeg",
                   help="mjpeg (intra/AVI) | libx264 | mpeg4 (inter/mp4)")
    p.add_argument("--gop", type=int, default=0, help="keyframe interval (inter codecs)")
    args = p.parse_args(argv)

    from oatx.config.schema import DataLoaderCfg
    from oatx.data.factory import build_dataset
    from oatx.data.loader import Collator, ShardedLoader
    from oatx.data.tokenizer import WordPieceTokenizer

    with tempfile.TemporaryDirectory() as td:
        cfg = DataLoaderCfg(
            dataset_name="SyntheticVideoText", data_dir=f"{td}/v", object_dir="",
            batch_size=8, num_workers=args.workers, split="train",
            video_params={"num_frames": args.frames, "num_videos": args.clips,
                          "loading": "lax",
                          # realistic decode load straight from the dataset
                          "fixture_width": args.res,
                          "fixture_height": args.res * 3 // 4,
                          "fixture_frames": args.len, "fixture_fps": 24,
                          "fixture_codec": args.codec, "fixture_gop": args.gop})
        ds = build_dataset(cfg, "baseline", "train")

        tok = WordPieceTokenizer.build_from_corpus(["a dog"], vocab_size=64)
        loader = ShardedLoader(ds, batch_size=8, collate=Collator(tok),
                               shuffle=True, num_workers=args.workers, seed=0)
        # warm epoch (page cache), then timed epoch
        for _ in loader:
            pass
        loader.set_epoch(1)
        t0 = time.perf_counter()
        clips = sum(b["video"].shape[0] for b in loader)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "host_decode_throughput",
            "clips_per_sec": round(clips / dt, 1),
            "frames_per_sec": round(clips * args.frames / dt, 1),
            "workers": args.workers,
            "clip": f"{args.res}x{args.res * 3 // 4} {args.codec}"
                    f"{f' gop{args.gop}' if args.gop else ''}, {args.len} frames, "
                    f"{args.frames} sampled + canonicalized to 256^2",
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
