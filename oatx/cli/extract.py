"""Offline object-extraction entry point (ObjectExtractor equivalent).

    python -m oatx.cli.extract --list items.tsv --out objects/ [--workers 8]
    python -m oatx.cli.extract --list items.tsv --out objects/ --missing-only
    python -m oatx.cli.extract --list items.tsv --out objects/ \
        --detector torch --detector-weights butd.torchscript
    python -m oatx.cli.extract --list items.tsv --out objects/ \
        --detector roi_backbone --detector-config cfg.json [--detector-ckpt dir]

items.tsv: one `video_id<TAB>video_path` per line. Detectors
(oatx.data.extraction):
  stub          deterministic synthetic regions (default; hermetic)
  torch         a TorchScript detector artifact (--detector-weights)
  roi_backbone  the TPU-native path — proposer boxes pooled from oatx's own
                video tower patch grid via ROI-align; --detector-config is an
                experiment JSON for the tower, --detector-ckpt optional
                trained weights (otherwise the config's arch.load_checkpoint,
                otherwise random init for pipeline proofs)
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_roi_backbone(config_path, ckpt, frames_regions):
    import jax

    from oatx.config.parser import load_experiment
    from oatx.config.schema import build_tower_config
    from oatx.data.extraction import RoiBackboneExtractor
    from oatx.models import towers
    from oatx.train import checkpoint as ckptlib

    exp = load_experiment(["-c", str(config_path)], test=True)
    tower_cfg = build_tower_config(exp.cfg.arch)
    params = towers.init(jax.random.PRNGKey(0), tower_cfg)
    load = ckpt or exp.cfg.arch.load_checkpoint
    if load:
        params = ckptlib.import_initial_weights(load, tower_cfg, params)
    return RoiBackboneExtractor(params, tower_cfg, num_regions=frames_regions)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--list", required=True, help="TSV of video_id\\tvideo_path")
    p.add_argument("--out", required=True)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--regions", type=int, default=10)
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--missing-only", action="store_true",
                   help="print the loss list (items with missing npz) and exit")
    p.add_argument("--processes", action="store_true",
                   help="process pool instead of threads")
    p.add_argument("--detector", default="stub",
                   choices=["stub", "torch", "roi_backbone"])
    p.add_argument("--detector-weights", default=None,
                   help="TorchScript artifact for --detector torch")
    p.add_argument("--detector-config", default=None,
                   help="experiment JSON for --detector roi_backbone")
    p.add_argument("--detector-ckpt", default=None,
                   help="oatx checkpoint for --detector roi_backbone")
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

    if args.detector == "torch":
        if not args.detector_weights:
            p.error("--detector torch requires --detector-weights")
        detector = ex.load_torch_detector(args.detector_weights)
    elif args.detector == "roi_backbone":
        if not args.detector_config:
            p.error("--detector roi_backbone requires --detector-config")
        detector = _build_roi_backbone(args.detector_config,
                                       args.detector_ckpt, args.regions)
        if args.processes:
            p.error("--detector roi_backbone runs jitted on the host device; "
                    "use the (default) thread pool")
    else:
        detector = ex.StubDetector(num_regions=args.regions)
    stats = ex.extract_dataset(
        items, args.out, detector, num_workers=args.workers,
        num_extraction_frames=args.frames, overwrite=args.overwrite,
        use_processes=args.processes)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
