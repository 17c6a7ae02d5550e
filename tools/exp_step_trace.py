"""Capture + analyze a device trace of the flagship bs=8 train step.

Round 3's trace analysis established that ~26% of device-busy time in the
bs=8 train step is pure data movement (copy/reshape/slice fusions) but only
reported per-CLASS totals. This tool names the individual ops: it captures a
jax.profiler trace of N chained train steps (same construction as
tools/exp_step_time.py), finds the /device:TPU lane in trace.json.gz, and
prints the top ops by total device time with per-class aggregates — so layout
work targets real offenders instead of op classes.

Usage: python tools/exp_step_trace.py [trace_dir] [batch] [steps]
"""

from __future__ import annotations

import collections
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def classify(name: str) -> str:
    n = name.lower()
    for key in ("copy-done", "copy-start", "copy", "reshape", "transpose",
                "slice", "concatenate", "broadcast", "convert", "fusion",
                "convolution", "dot", "all-reduce", "scatter", "dynamic"):
        if key in n:
            return key
    return "other"


def capture(trace_dir: str, bs: int, steps: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from oatx.models import distilbert as dbert
    from oatx.models import towers
    from oatx.models import vit_spacetime as vst
    from oatx.train import optim, step as steplib

    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(rng.standard_normal((bs, 4, 224, 224, 3)), jnp.bfloat16),
        "input_ids": jnp.asarray(rng.integers(0, 30522, (bs, 24))),
        "attention_mask": jnp.ones((bs, 24), jnp.int32),
    }
    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(num_frames=4, time_init="zeros"),
        text=dbert.DistilBertConfig(), projection_dim=256,
        variant="baseline", compute_dtype=jnp.bfloat16)
    optimizer = optim.make_optimizer(lr=2e-4)
    state = steplib.init_state(jax.random.PRNGKey(0), cfg, optimizer)
    train_step = steplib.make_train_step(cfg, steplib.LossConfig(), optimizer)
    state, m = train_step(state, batch)
    _ = float(m["loss"])  # compile + warm
    for _ in range(3):
        state, m = train_step(state, batch)
    _ = float(m["loss"])
    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = train_step(state, batch)
        _ = float(m["loss"])
        wall = (time.perf_counter() - t0) / steps * 1e3
    print(f"# traced {steps} steps, wall {wall:.1f} ms/step", file=sys.stderr)


def analyze(trace_dir: str, steps: int) -> dict:
    # lane selection (TPU pids → "XLA Ops" tids) lives in one place:
    # oatx.utils.profiler._device_op_events
    from oatx.utils.profiler import _device_op_events

    events = _device_op_events(trace_dir)
    assert events, f"no device-op events under {trace_dir}"
    per_op = collections.Counter()
    op_count = collections.Counter()
    one_arg = {}
    for e in events:
        name = e.get("name", "?")
        per_op[name] += e.get("dur", 0)
        op_count[name] += 1
        if name not in one_arg and e.get("args"):
            one_arg[name] = e["args"]
    total_us = sum(per_op.values())
    per_class = collections.Counter()
    for name, us in per_op.items():
        per_class[classify(name)] += us
    print(f"\ndevice total {total_us/1e3/steps:.1f} ms/step over {steps} steps")
    print("\n== per-class (ms/step, % of device) ==")
    for cls, us in per_class.most_common():
        print(f"  {cls:<14} {us/1e3/steps:8.2f}  {us/total_us*100:5.1f}%")
    print("\n== top 40 ops by total device time ==")
    for name, us in per_op.most_common(40):
        args = one_arg.get(name, {})
        shape = args.get("shape", args.get("tf_op", ""))
        print(f"  {us/1e3/steps:8.3f} ms  x{op_count[name]//steps:<4} {name[:110]}"
              + (f"  [{shape}]" if shape else ""))
    return {"total_ms_per_step": total_us / 1e3 / steps}


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_trace"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    if not os.environ.get("OATX_ANALYZE_ONLY"):
        capture(trace_dir, bs, steps)
    analyze(trace_dir, steps)


if __name__ == "__main__":
    main()
