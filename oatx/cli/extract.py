"""Offline object-extraction entry point (ObjectExtractor equivalent).

    python -m oatx.cli.extract --list items.tsv --out objects/ [--workers 8]
    python -m oatx.cli.extract --list items.tsv --out objects/ --missing-only

items.tsv: one `video_id<TAB>video_path` per line. The detector defaults to the
hermetic StubDetector; pass --detector-weights to plug a real BUTD stack (see
oatx.data.extraction.load_torch_detector).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--list", required=True, help="TSV of video_id\\tvideo_path")
    p.add_argument("--out", required=True)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--missing-only", action="store_true",
                   help="print the loss list (items with missing npz) and exit")
    p.add_argument("--processes", action="store_true",
                   help="process pool instead of threads")
    p.add_argument("--detector-weights", default=None)
    args = p.parse_args(argv)

    from oatx.data import extraction as ex

    items = []
    with open(args.list) as f:
        for ln, line in enumerate(f, 1):
            line = line.strip()
            if not line:
                continue
            parts = line.split("\t")
            if len(parts) != 2:
                p.error(f"{args.list}:{ln}: expected 'video_id<TAB>video_path', got {line!r}")
            items.append((parts[0], parts[1]))

    if args.missing_only:
        missing = ex.missing_items(items, args.out, args.frames)
        for vid, path in missing:
            print(f"{vid}\t{path}")
        print(f"# {len(missing)}/{len(items)} missing", file=sys.stderr)
        return 0

    detector = (ex.load_torch_detector(args.detector_weights)
                if args.detector_weights else ex.StubDetector())
    stats = ex.extract_dataset(
        items, args.out, detector, num_workers=args.workers,
        num_extraction_frames=args.frames, overwrite=args.overwrite,
        use_processes=args.processes)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
