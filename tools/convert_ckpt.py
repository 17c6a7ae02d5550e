"""Checkpoint conversion CLI — torch ⇄ oatx.

    # reference/timm torch .pth → oatx Orbax snapshot
    python tools/convert_ckpt.py to-oatx --src model.pth --dst out_dir \
        [--variant baseline|global_local|region_mem] [--num-frames 4] \
        [--temporal-fix zeros]

    # oatx snapshot → reference-compatible torch .pth
    python tools/convert_ckpt.py to-torch --src <oatx snapshot dir> --dst model.pth \
        [--variant ...] [--num-frames 4]

Variant selects which projection heads ride along (reference Sequential key
schema: txt_proj.1 / vid_proj.0 / txt_proj_2.1 / text_local_proj.1 /
vid_local_proj.0 — oa_model_global_local.py:100-135, oa_model_region_mem.py:66-77).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["to-oatx", "to-torch"])
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--variant", default="baseline",
                   choices=["baseline", "global_local", "region_mem"])
    p.add_argument("--num-frames", type=int, default=4)
    p.add_argument("--temporal-fix", default="zeros",
                   choices=["zeros", "interp", "bilinear"])
    args = p.parse_args(argv)

    import jax

    from oatx.models import convert, towers, distilbert as dbert, vit_spacetime as vst

    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(num_frames=args.num_frames, time_init="zeros"),
        text=dbert.DistilBertConfig(), projection_dim=256, variant=args.variant)

    if args.mode == "to-oatx":
        sd = convert.load_torch_checkpoint(args.src)
        fresh = towers.init(jax.random.PRNGKey(0), cfg)
        params = dict(fresh)
        imported = convert.frozen_in_time_from_torch(
            sd, cfg.video, cfg.text, fresh_video_params=fresh["video"],
            temporal_fix=args.temporal_fix)
        params.update(imported)
        missing = sorted(set(fresh) - set(imported))
        if missing:
            print(f"note: {missing} not in source checkpoint — keeping fresh init")
        import orbax.checkpoint as ocp
        import numpy as np
        from pathlib import Path

        dst = Path(args.dst).resolve()
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(dst, {"params": jax.tree_util.tree_map(np.asarray, params)},
                       force=True)
        n = sum(x.size for x in jax.tree_util.tree_leaves(params))
        print(f"wrote oatx snapshot {dst} ({n / 1e6:.1f}M params, variant={args.variant})")
    else:
        from oatx.train.checkpoint import import_initial_weights

        fresh = towers.init(jax.random.PRNGKey(0), cfg)
        params = import_initial_weights(args.src, cfg, fresh)
        convert.export_torch_checkpoint(args.dst, params, cfg.video)
        print(f"wrote torch checkpoint {args.dst} (variant={args.variant})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
