"""Root-cause the eval-throughput batch inversion (VERDICT r2 item #2).

Round-2 PERF.md measured make_eval_step throughput FALLING with batch size
(285.6 clips/s @bs=8 → 193.7 @bs=64) without explaining why. This tool
separates the candidate costs per batch size:

  A. device compute only — batch RESIDENT on device, steps chained through a
     token dependency, one scalar fetch at the end;
  B. + H2D transfer — fresh uint8 canonical batch device_put each step (what
     a naive eval loop pays; device_prefetch overlaps this in production);
  C. D2H fetch — np.asarray of the (B, 256) embeddings each step (what the
     eval loop pays to collect the corpus).

Each region ends with a scalar fetch (relay-safe timing, CLAUDE.md). Optional
--trace captures a jax.profiler trace of the resident-batch loop at the
largest batch for op-level attribution.

Usage: python tools/bench_eval_profile.py [--batches 8,16,32,64] [--iters 12]
       [--frames 4] [--trace /tmp/eval_trace]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="8,16,32,64")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--canon", type=int, default=256)
    p.add_argument("--trace", default=None)
    p.add_argument("--chunk", type=int, default=None,
                   help="scan chunk size for make_eval_step (large-batch "
                        "layout fix; PERF.md round 3)")
    args = p.parse_args(argv)
    batches = [int(x) for x in args.batches.split(",")]

    import jax
    import jax.numpy as jnp

    from oatx.models import distilbert as dbert
    from oatx.models import towers
    from oatx.models import vit_spacetime as vst
    from oatx.train import step as steplib

    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(num_frames=args.frames, time_init="zeros"),
        text=dbert.DistilBertConfig(),
        projection_dim=256, variant="baseline", compute_dtype=jnp.bfloat16)
    params = towers.init(jax.random.PRNGKey(0), cfg)
    eval_step = steplib.make_eval_step(cfg, chunk=args.chunk)

    rng = np.random.default_rng(0)
    rows = []
    for bs in batches:
        host_batch = {
            "video": rng.integers(0, 255, (bs, args.frames, args.canon,
                                           args.canon, 3), dtype=np.uint8),
            "input_ids": rng.integers(0, 30522, (bs, 24)).astype(np.int32),
            "attention_mask": np.ones((bs, 24), np.int32),
        }
        h2d_bytes = sum(v.nbytes for v in host_batch.values())
        resident = {k: jax.device_put(v) for k, v in host_batch.items()}
        out = eval_step(params, resident)  # compile
        _ = float(out["text_embeds"][0, 0])

        # A: device compute only (resident batch, chained via carried scalar)
        t0 = time.perf_counter()
        acc = None
        for _ in range(args.iters):
            out = eval_step(params, resident)
            # chain: fold a scalar of this step into the next fetch
            acc = out["text_embeds"][0, 0] + (acc if acc is not None else 0.0)
        _ = float(acc)
        dev_ms = (time.perf_counter() - t0) / args.iters * 1e3

        # B: + H2D each step (device_put of the full uint8 batch)
        t0 = time.perf_counter()
        acc = None
        for _ in range(args.iters):
            dev = {k: jax.device_put(v) for k, v in host_batch.items()}
            out = eval_step(params, dev)
            acc = out["text_embeds"][0, 0] + (acc if acc is not None else 0.0)
        _ = float(acc)
        h2d_ms = (time.perf_counter() - t0) / args.iters * 1e3

        # C: + D2H embedding fetch each step (resident input)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = eval_step(params, resident)
            _ = np.asarray(out["text_embeds"]), np.asarray(out["video_embeds"])
        d2h_ms = (time.perf_counter() - t0) / args.iters * 1e3

        rows.append({
            "bs": bs,
            "chunk": args.chunk,
            "device_ms": round(dev_ms, 1),
            "device_clips_per_s": round(bs / dev_ms * 1e3, 1),
            "with_h2d_ms": round(h2d_ms, 1),
            "with_h2d_clips_per_s": round(bs / h2d_ms * 1e3, 1),
            "with_d2h_ms": round(d2h_ms, 1),
            "h2d_mb": round(h2d_bytes / 1e6, 1),
            "implied_h2d_mb_per_s": round(
                h2d_bytes / 1e6 / max(1e-9, (h2d_ms - dev_ms) / 1e3), 1),
        })
        print(json.dumps(rows[-1]), file=sys.stderr)

    if args.trace:
        bs = batches[-1]
        resident = {
            "video": jax.device_put(rng.integers(
                0, 255, (bs, args.frames, args.canon, args.canon, 3),
                dtype=np.uint8)),
            "input_ids": jax.device_put(
                rng.integers(0, 30522, (bs, 24)).astype(np.int32)),
            "attention_mask": jax.device_put(np.ones((bs, 24), np.int32)),
        }
        with jax.profiler.trace(args.trace):
            acc = None
            for _ in range(5):
                out = eval_step(params, resident)
                acc = out["text_embeds"][0, 0] + (acc if acc is not None else 0.0)
            _ = float(acc)
        print(f"# trace written to {args.trace}", file=sys.stderr)

    print(json.dumps({"metric": "eval_batch_sweep", "rows": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
