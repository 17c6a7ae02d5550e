"""Experiment: ViT-L/16 (and optionally ViT-H/14) train step ON THE REAL CHIP.

Round 3 added large-model arch geometries + a pod recipe config, but no ViT-L
step had ever executed on real hardware (VERDICT r3 weak #4). This measures,
per (batch, remat) point at true ViT-L/16 geometry (1024 dims, 24 depth, 16
heads, 4×224² frames + DistilBERT), whether the full train step (fwd + global
NCE + bwd + AdamW, bf16 compute / f32 master) FITS in the chip's HBM and at
what clips/s — plus the device memory high-water when the backend reports it.

Timing per CLAUDE.md: chained steps inside the timed region, scalar fetch at
the end; 2 windows, first discarded.

Usage: python tools/exp_vitl_real.py [--arch large|huge] [--bs 1,2,4,8]
       [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

# geometries come from the same table the recipe configs resolve through —
# a drift there would otherwise leave this tool benchmarking stale dims
from oatx.config.schema import ARCH_TABLE as _ARCH_TABLE

GEOM = {
    name.split("_")[0]: dict(embed_dim=dims[0], depth=dims[1],
                             num_heads=dims[2], patch_size=dims[3])
    for name, dims in _ARCH_TABLE.items()
    if name.split("_")[0] in ("base", "large", "huge")
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="large", choices=sorted(GEOM))
    p.add_argument("--bs", default="1,2,4,8")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--remat", default="dots,full,off",
                   help="comma list of remat modes to try per bs")
    p.add_argument("--frames", type=int, default=4,
                   help="clip length (16 = the long-context lane)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from oatx.models import distilbert as dbert
    from oatx.models import towers
    from oatx.models import vit_spacetime as vst
    from oatx.train import optim, step as steplib

    g = GEOM[args.arch]
    frames, seq_len = args.frames, 24

    def build(remat_mode: str):
        remat = remat_mode != "off"
        policy = remat_mode if remat_mode in ("dots", "dots_all") else "full"
        cfg = towers.TowerConfig(
            video=vst.SpaceTimeViTConfig(
                num_frames=frames, time_init="zeros",
                embed_dim=g["embed_dim"], depth=g["depth"],
                num_heads=g["num_heads"], patch_size=g["patch_size"],
                remat=remat,
                **({"remat_policy": policy} if remat else {}),
            ),
            text=dbert.DistilBertConfig(),
            projection_dim=256, variant="baseline",
            compute_dtype=jnp.bfloat16)
        optimizer = optim.make_optimizer(lr=2e-4)
        state = steplib.init_state(jax.random.PRNGKey(0), cfg, optimizer)
        train_step = steplib.make_train_step(cfg, steplib.LossConfig(), optimizer)
        return state, train_step

    def batch_of(bs):
        rng = np.random.default_rng(0)
        return {
            "video": jnp.asarray(
                rng.standard_normal((bs, frames, 224, 224, 3)), jnp.bfloat16),
            "input_ids": jnp.asarray(rng.integers(0, 30522, (bs, seq_len))),
            "attention_mask": jnp.ones((bs, seq_len), jnp.int32),
        }

    def hbm_high_water():
        try:
            stats = jax.local_devices()[0].memory_stats()
            return round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
        except Exception:
            return None

    rows = []
    n_params = None
    for bs in [int(x) for x in args.bs.split(",")]:
        batch = batch_of(bs)
        for remat_mode in args.remat.split(","):
            label = f"bs={bs} remat={remat_mode}"
            try:
                state, train_step = build(remat_mode)
                if n_params is None:
                    n_params = sum(np.prod(x.shape) for x in
                                   jax.tree_util.tree_leaves(state.params))
                state, metrics = train_step(state, batch)  # compile + step 1
                _ = float(metrics["loss"])
                dts = []
                for _w in range(2):
                    t0 = time.perf_counter()
                    for _ in range(args.iters):
                        state, metrics = train_step(state, batch)
                    _ = float(metrics["loss"])
                    dts.append((time.perf_counter() - t0) / args.iters)
                dt = dts[-1]
                rows.append({
                    "arch": args.arch, "frames": frames,
                    "bs": bs, "remat": remat_mode,
                    "step_ms": round(dt * 1e3, 1),
                    "clips_per_sec": round(bs / dt, 2),
                    "ms_per_clip": round(dt * 1e3 / bs, 2),
                    "hbm_peak_gib": hbm_high_water(),
                    "windows_ms": [round(d * 1e3, 1) for d in dts],
                    "loss": float(metrics["loss"]),
                })
                print(json.dumps(rows[-1]), flush=True)
                del state, train_step
            except Exception as e:  # OOM or compile failure: record and move on
                # drop any half-built model BEFORE the next point — a live
                # params+AdamW tree from the failed point would make the next
                # point OOM spuriously and corrupt the fits/OOM conclusion
                state = train_step = None  # noqa: F841
                msg = str(e)
                oom = "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg \
                    or "exceeds the memory" in msg
                # the dev relay's remote compile helper 500s on SOME
                # large-geometry points (a relay bug, point-specific — the
                # same configs compile on the CPU mesh); treat it like OOM
                # (record, move on) rather than aborting the sweep
                relay_bug = "remote_compile" in msg or "compile-help" in msg
                rows.append({"arch": args.arch, "frames": frames,
                             "bs": bs, "remat": remat_mode, "fits": False,
                             "error": ("OOM" if oom else
                                       "relay-compile-500" if relay_bug
                                       else msg[:200])})
                print(json.dumps(rows[-1]), flush=True)
                if not (oom or relay_bug):
                    break
    print(json.dumps({"summary": rows, "n_params_million":
                      None if n_params is None else round(n_params / 1e6, 1)}))


if __name__ == "__main__":
    main()
