"""Experiment: scan-chunked tower forwards inside the TRAIN step.

The eval-side fix (PERF.md round 3) showed XLA's big-batch layouts degrade
above bs~16 while bs-8 layouts are copy-free. Training was pinned at bs=8
for the same reason (101 vs 91.3 clips/s at 16, round-2 sweep) — but the
contrastive loss WANTS large batches (more global negatives). This measures
a third option: compute both towers' embeddings chunk-by-chunk under
lax.scan (bs-8 layouts in forward AND its transposed backward), then apply
the NormSoftmax loss over ALL embeddings — semantics identical to a plain
large-batch step (embeddings -> global similarity matrix), layouts identical
to the bs-8 step.

Rows: plain bs=8/16/32 vs chunked(8) bs=16/32/64, per-clip step time on the
real chip. Timing per CLAUDE.md: chained steps, scalar fetch at the end.

Usage: python tools/exp_chunked_train.py [--iters 15]
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
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--chunk", type=int, default=8)
    p.add_argument("--plain", default="8,16,32")
    p.add_argument("--chunked", default="16,32,64")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from oatx.models import distilbert as dbert
    from oatx.models import towers
    from oatx.models import vit_spacetime as vst
    from oatx.train import optim, step as steplib

    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(num_frames=4, time_init="zeros"),
        text=dbert.DistilBertConfig(), projection_dim=256,
        variant="baseline", compute_dtype=jnp.bfloat16)
    loss_cfg = steplib.LossConfig()
    optimizer = optim.make_optimizer(lr=2e-4)

    def make_batch(bs):
        rng = np.random.default_rng(0)
        return {
            "video": jnp.asarray(rng.standard_normal((bs, 4, 224, 224, 3)), jnp.bfloat16),
            "input_ids": jnp.asarray(rng.integers(0, 30522, (bs, 24))),
            "attention_mask": jnp.ones((bs, 24), jnp.int32),
        }

    def make_chunked_step(chunk, remat=True):
        def loss_fn(params, batch):
            fwd = lambda mb: towers.forward_baseline(params, cfg, mb)
            if remat:
                # without remat each chunk's f32 attention probs
                # (150 MB x 12 blocks per chunk) are saved as scan residuals
                # and bs=16 already overflows the 16 GB HBM; remat trades
                # one extra forward per chunk for bounded memory
                fwd = jax.checkpoint(fwd)
            text_e, video_e = steplib.scan_chunked(fwd, chunk)(batch)
            return steplib._embed_pair_loss(text_e, video_e, loss_cfg)

        def step(state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return steplib.TrainState(params, opt_state, state.step + 1), {"loss": loss}

        return jax.jit(step, donate_argnums=(0,))

    def bench(step_fn, bs, label):
        state = steplib.init_state(jax.random.PRNGKey(0), cfg, optimizer)
        batch = make_batch(bs)
        state, m = step_fn(state, batch)
        _ = float(m["loss"])  # compile + sync
        for _ in range(3):
            state, m = step_fn(state, batch)
        _ = float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = step_fn(state, batch)
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        row = {"mode": label, "bs": bs, "step_ms": round(dt * 1e3, 2),
               "clips_per_s": round(bs / dt, 1),
               "ms_per_clip": round(dt * 1e3 / bs, 3)}
        print(json.dumps(row), file=sys.stderr)
        del state
        return row

    rows = []
    plain_step = steplib.make_train_step(cfg, loss_cfg, optimizer)
    for bs in [int(x) for x in args.plain.split(",") if x]:
        rows.append(bench(plain_step, bs, "plain"))
    chunked_step = make_chunked_step(args.chunk)
    for bs in [int(x) for x in args.chunked.split(",") if x]:
        rows.append(bench(chunked_step, bs, f"chunked{args.chunk}"))
    print(json.dumps({"metric": "chunked_train_step", "rows": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
