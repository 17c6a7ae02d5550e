"""Serving latency benchmark — batched video→embedding p50/p90/p99 per bucket
(the BASELINE.json north-star serving metric), measured relay-safely (latency =
request → embedding bytes on host).

    python tools/bench_serving.py [--buckets 1,4,16] [--iters 30]

--concurrency N adds a SUSTAINED-LOAD phase (VERDICT r2 item #7): N client
threads fire single-clip requests into the MicroBatcher's coalescing queue
for --load-seconds; reports qps + p50/p99 under load and the realized
coalesced batch-size distribution — the first evidence the micro-batching
queue earns its complexity.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def run_concurrency(svc, frames: int, n_clients: int, seconds: float):
    from oatx.serve.embed_service import MicroBatcher

    batcher = MicroBatcher(svc, max_batch=16, max_wait_ms=5.0)
    rng = np.random.default_rng(1)
    clip = rng.integers(0, 255, (1, frames, 256, 256, 3)).astype(np.uint8)
    lat_lock = threading.Lock()
    lats, errors = [], []
    stop = threading.Event()

    def client(i):
        while not stop.is_set():
            t0 = time.perf_counter()
            try:
                out = batcher.submit(clip[0])
                assert out.shape[-1] == svc.cfg.projection_dim
            except Exception as e:  # noqa: BLE001 — report, don't kill thread
                with lat_lock:
                    errors.append(repr(e))
                return
            with lat_lock:
                lats.append((time.perf_counter() - t0) * 1e3)

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(seconds)
    stop.set()
    for t in threads:
        t.join(timeout=30)
    wall = time.perf_counter() - t0
    batcher.close()
    with lat_lock:
        done = sorted(lats)
    if not done:
        return {"error": errors[:3] or "no completed requests"}
    pct = lambda p: done[min(len(done) - 1, int(p / 100 * len(done)))]
    sizes = getattr(batcher, "batch_sizes", None)
    out = {
        "clients": n_clients,
        "qps": round(len(done) / wall, 1),
        "p50_ms": round(pct(50), 1),
        "p99_ms": round(pct(99), 1),
        "requests": len(done),
        "errors": len(errors),
    }
    if sizes:
        out["coalesced_batch_mean"] = round(float(np.mean(sizes)), 2)
        out["coalesced_batch_max"] = int(np.max(sizes))
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--buckets", default="1,4,16")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--concurrency", default=None,
                   help="comma list of client counts for the sustained phase, "
                        "e.g. 2,8,16")
    p.add_argument("--load-seconds", type=float, default=20.0)
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
    if args.concurrency:
        out["sustained"] = [
            run_concurrency(svc, args.frames, int(c), args.load_seconds)
            for c in args.concurrency.split(",")]
    print(json.dumps({"metric": "video_embed_serving_latency",
                      "model": "ViT-B/16 4x224^2 bf16", **out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
