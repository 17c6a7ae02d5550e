"""Integrated input-pipeline → device training benchmark (VERDICT r2 item #1).

Drives the REAL host data plane — on-disk MJPEG clips → native FFmpeg decode →
ShardedLoader workers → Collator (tokenize) → device_prefetch (double-buffered
H2D) — into the flagship bf16 train step on the TPU, and reports:

  * e2e clips/s (the number that matters for production training),
  * device-only clips/s on a resident synthetic batch (bench.py's headline),
  * input-stall % = 1 - device_step_time / e2e_step_time,
  * host decode-only clips/s (loader sans device), and the host core count
    needed to saturate the chip (this dev VM has ONE core; the loader's
    GIL-free ctypes decode scales with cores on real hosts).

This measures the one subsystem bench.py deliberately excludes, and exactly
where the reference starved its GPUs (per-worker cv2 seek decode,
/root/reference/OATrans/base/base_dataset.py:503-527).

Timing discipline (CLAUDE.md): the axon relay's block_until_ready returns
early, so every timed region ends with a scalar fetch (float(loss)) which
serializes the dependency chain.

Usage:  python tools/bench_train_e2e.py [--steps 30] [--workers 2]
        [--clips 96] [--fixture 320x240x64] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def build_dataset(data_dir: str, n_clips: int, fw: int, fh: int, ff: int,
                  codec: str = "mjpeg", gop: int = 0):
    import oatx.data.datasets.adapters  # noqa: F401
    from oatx.config.registry import DATASETS
    from oatx.config.schema import DataLoaderCfg

    return DATASETS.get("SyntheticVideoText")(DataLoaderCfg(
        dataset_name="SyntheticVideoText", data_dir=data_dir,
        video_params={"input_res": 224, "num_frames": 4, "num_videos": n_clips,
                      "fixture_width": fw, "fixture_height": fh,
                      "fixture_frames": ff, "loading": "strict",
                      "fixture_codec": codec, "fixture_gop": gop,
                      "fixture_fps": 24},
        split="train"))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--clips", type=int, default=96)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--fixture", default="320x240x64")
    p.add_argument("--data-dir", default="/tmp/oatx_e2e_bench/videos")
    p.add_argument("--prefetch-depth", type=int, default=2)
    p.add_argument("--codec", default="mjpeg",
                   help="fixture codec: mjpeg | libx264 | mpeg4 (inter/mp4)")
    p.add_argument("--gop", type=int, default=0)
    p.add_argument("--train-crop", default="device_canonical",
                   choices=["device_canonical", "reference_full_frame"],
                   help="reference_full_frame = host-side RRC, ships 224^2 "
                        "uint8 (23%% fewer H2D bytes than the 256^2 canvas)")
    args = p.parse_args(argv)
    fw, fh, ff = (int(x) for x in args.fixture.split("x"))

    import jax
    import jax.numpy as jnp

    from oatx.data.loader import Collator, ShardedLoader, device_prefetch
    from oatx.data.tokenizer import WordPieceTokenizer
    from oatx.models import distilbert as dbert
    from oatx.models import towers
    from oatx.models import vit_spacetime as vst
    from oatx.parallel import mesh as meshlib
    from oatx.train import optim, step as steplib

    t_gen = time.perf_counter()
    # keyed by fixture spec so geometry/codec changes never reuse stale clips
    data_dir = os.path.join(args.data_dir,
                            f"{args.fixture}_{args.codec}{args.gop or ''}")
    ds = build_dataset(data_dir, args.clips, fw, fh, ff, args.codec, args.gop)
    if args.train_crop != "device_canonical":
        # rebuild with the host-side crop lane (base.py reads video_params)
        from oatx.config.schema import DataLoaderCfg as _DL  # noqa: F401
        ds.train_crop = args.train_crop
        ds.train_crop_res = 224
    print(f"# dataset ready ({args.clips} clips {fw}x{fh}x{ff}) "
          f"in {time.perf_counter() - t_gen:.1f}s", file=sys.stderr)

    tok = WordPieceTokenizer.build_from_corpus(
        [ds.metadata[i]["caption"] for i in range(len(ds.metadata))],
        vocab_size=4096)

    mesh = meshlib.make_mesh(1)
    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(num_frames=4, time_init="zeros"),
        text=dbert.DistilBertConfig(),
        projection_dim=256, variant="baseline", compute_dtype=jnp.bfloat16)
    optimizer = optim.make_optimizer(lr=2e-4)
    state = steplib.init_state(jax.random.PRNGKey(0), cfg, optimizer)
    tcfg = None
    if args.train_crop == "reference_full_frame":
        from oatx.data.transforms import TransformConfig
        tcfg = TransformConfig(input_res=224, host_precropped=True)
    augment = steplib.make_augmenter(transform_cfg=tcfg, train=True,
                                     tower_cfg=cfg)
    train_step = steplib.make_train_step(cfg, steplib.LossConfig(), optimizer,
                                         augment=augment, donate=False,
                                         base_rng=jax.random.PRNGKey(7))

    def loader():
        return ShardedLoader(ds, batch_size=args.batch, collate=Collator(tok),
                             shuffle=True, num_workers=args.workers, seed=3,
                             drop_last=True)

    # ---- 1. host decode-only rate (loader alone, no device work)
    n = 0
    it = iter(loader())
    next(it)  # absorb worker spin-up
    t0 = time.perf_counter()
    for batch in it:
        n += batch["video"].shape[0]
    host_dt = time.perf_counter() - t0
    host_clips = n / host_dt

    # ---- 2. device-only rate (resident canonical batch, same augment path)
    sample = next(iter(loader()))
    resident = {k: jax.device_put(v) for k, v in sample.items() if k != "meta"}
    state, m = train_step(state, resident)  # compile
    _ = float(m["loss"])
    for _ in range(3):
        state, m = train_step(state, resident)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    dev_iters = max(10, args.steps)
    for _ in range(dev_iters):
        state, m = train_step(state, resident)
    _ = float(m["loss"])
    dev_step = (time.perf_counter() - t0) / dev_iters
    dev_clips = args.batch / dev_step

    # ---- 3. integrated e2e: loader -> prefetch -> train step
    def run_e2e(steps):
        nonlocal state
        it = device_prefetch(iter(loader()), mesh=mesh,
                             depth=args.prefetch_depth)
        # endless re-wrap across epochs of the small fixture set
        done = 0
        t0 = None
        while done < steps + 2:
            for batch in it:
                batch = {k: v for k, v in batch.items() if k != "meta"}
                state, m = train_step(state, batch)
                done += 1
                if done == 2:
                    _ = float(m["loss"])  # drain compile/warmup
                    t0 = time.perf_counter()
                if done >= steps + 2:
                    break
            else:
                it = device_prefetch(iter(loader()), mesh=mesh,
                                     depth=args.prefetch_depth)
                continue
        _ = float(m["loss"])
        return (time.perf_counter() - t0) / steps

    e2e_step = run_e2e(args.steps)
    e2e_clips = args.batch / e2e_step

    stall = max(0.0, 1.0 - dev_step / e2e_step)
    cores = os.cpu_count() or 1
    # host cost per clip (this box) vs device demand → cores to saturate
    cores_needed = (1.0 / host_clips) * dev_clips * cores

    print(json.dumps({
        "metric": "train_e2e_clips_per_sec",
        "value": round(e2e_clips, 2),
        "unit": f"clips/s (disk->decode->loader->prefetch->train, bs={args.batch}, "
                f"{args.workers} workers, {cores}-core host)",
        "device_only_clips_per_sec": round(dev_clips, 2),
        "host_decode_clips_per_sec": round(host_clips, 2),
        "input_stall_pct": round(stall * 100, 1),
        "e2e_over_device_pct": round(100 * e2e_clips / dev_clips, 1),
        "step_ms": {"device": round(dev_step * 1e3, 2),
                    "e2e": round(e2e_step * 1e3, 2)},
        "est_host_cores_to_saturate": round(cores_needed, 2),
        "fixture": f"{fw}x{fh}x{ff} {args.codec}",
        "train_crop": args.train_crop,
        "steps": args.steps,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
