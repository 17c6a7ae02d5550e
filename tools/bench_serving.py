"""Serving latency benchmark — batched video→embedding p50/p90/p99 per bucket
(the BASELINE.json north-star serving metric), measured relay-safely (latency =
request → embedding bytes on host).

    python tools/bench_serving.py [--buckets 1,4,16] [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--buckets", default="1,4,16")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--frames", type=int, default=4)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from oatx.models import distilbert as dbert, towers, vit_spacetime as vst
    from oatx.serve.embed_service import EmbedService

    buckets = tuple(int(b) for b in args.buckets.split(","))
    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(num_frames=args.frames, time_init="zeros"),
        text=dbert.DistilBertConfig(), projection_dim=256,
        compute_dtype=jnp.bfloat16)
    params = towers.init(jax.random.PRNGKey(0), cfg)
    svc = EmbedService(params, cfg, buckets=buckets)
    svc.warmup(frames=args.frames)

    rng = np.random.default_rng(0)
    out = {}
    for b in buckets:
        svc.stats["video"].samples_ms.clear()
        clips = rng.integers(0, 255, (b, args.frames, 256, 256, 3)).astype(np.uint8)
        for _ in range(args.iters):
            svc.embed_video(clips)
        s = svc.stats["video"].summary()
        out[f"batch_{b}"] = {
            "p50_ms": round(s["p50_ms"], 2),
            "p99_ms": round(s["p99_ms"], 2),
            "clips_per_sec": round(b / (s["mean_ms"] / 1e3), 1),
        }
    print(json.dumps({"metric": "video_embed_serving_latency",
                      "model": "ViT-B/16 4x224^2 bf16", **out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
