"""A/B: fused vs split-(patches, CLS) residual stream, ISOLATED video tower.

Round-3 history: the original version of this tool carried a hand-written
split-stream prototype, measured it 8.4% faster than the fused tower
(65.75 vs 71.74 ms fwd+bwd, bs=8 bf16, real chip — PERF.md "Split-stream
residual"), and the design then shipped as `SpaceTimeViTConfig.split_cls_stream`
(vit_spacetime._apply_split + attention.divided_attention_split). The tool now
drives the SHIPPED library path so re-runs measure the code that ships, not a
stale copy; the full-train-step A/B lives in tools/exp_step_time.py
(layouts 'split' / 'split2').

Usage: python tools/exp_split_stream.py [batch] [iters]
Measures: legacy tower, split (concat CLS merge), split2 (stream merge) —
grad-of-sum(cls²) per step, chained timing, scalar fetch (relay-safe).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from oatx.models import vit_spacetime as vst
    from oatx.ops import attention as A

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    base = vst.SpaceTimeViTConfig(num_frames=4, time_init="zeros",
                                  split_cls_stream=False)
    params = vst.init(jax.random.PRNGKey(0), base)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.standard_normal((bs, 4, 224, 224, 3)), jnp.bfloat16)

    variants = (
        ("legacy", False, "concat"),
        ("split", True, "concat"),
        ("split2", True, "stream"),
    )

    # forward parity of each split variant vs the fused stream
    cls_ref = vst.apply(params, base, video)["cls"].astype(jnp.float32)
    for name, split, merge in variants[1:]:
        A.set_split_merge(merge)
        cfg = dataclasses.replace(base, split_cls_stream=split)
        cls = vst.apply(params, cfg, video)["cls"].astype(jnp.float32)
        err = float(jnp.max(jnp.abs(cls - cls_ref)))
        print(f"fwd parity {name}: max|Δ|={err:.3e} "
              f"(max|cls|={float(jnp.max(jnp.abs(cls_ref))):.3e})", flush=True)
    A.set_split_merge("concat")

    for name, split, merge in variants:
        A.set_split_merge(merge)
        cfg = dataclasses.replace(base, split_cls_stream=split)

        def loss(p, v, _cfg=cfg):
            return jnp.sum(vst.apply(p, _cfg, v)["cls"].astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss))
        t0 = time.perf_counter()
        gr = g(params, video)
        _ = float(gr["cls_token"][0, 0, 0])
        print(f"{name}: compile+1 {time.perf_counter()-t0:.1f}s", flush=True)
        for _ in range(3):
            gr = g(params, video)
        _ = float(gr["cls_token"][0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            gr = g(params, video)
        _ = float(gr["cls_token"][0, 0, 0])
        dt = (time.perf_counter() - t0) / iters
        print(f"RESULT {name}/bs{bs}: {dt*1e3:.2f} ms/step (tower fwd+bwd)",
              flush=True)
    A.set_split_merge("concat")


if __name__ == "__main__":
    main()
