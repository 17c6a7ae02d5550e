"""Experiment: int8 MXU throughput vs bf16 on the dev chip.

v5e's MXU advertises 2x int8 throughput (394 TOPs vs 197 bf16 TFLOPs). If that
materializes at this model's shapes, an int8-quantized forward could lift the
embedding/serving path (currently 320 clips/s bf16, PERF.md) well past the
bf16 ceiling. This measures the raw matmul question before any quantization
engineering: chained (M,K)@(K,K) dots inside one jit (lax.fori_loop feeding
each output into the next input — per CLAUDE.md the ~26 ms dispatch overhead
would otherwise dominate), scalar fetch at the end, first rep discarded.

Shapes: K=768 / M=6304 (the flagship's token matmul), K=4096 (practical-peak
probe). int8 accumulates in int32 (MXU native), then shifts back to int8 for
the chain; bf16 chains through a cast. The elementwise feedback is identical
work in both lanes, so the delta isolates the MXU rate.

Usage: python tools/exp_int8_matmul.py [--iters 200] [--reps 4]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--reps", type=int, default=4)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from functools import partial

    rows = []

    def run(name, m, k, dtype, iters):
        rng = np.random.default_rng(0)
        if dtype == "int8":
            x = jnp.asarray(rng.integers(-64, 64, (m, k)), jnp.int8)
            w = jnp.asarray(rng.integers(-64, 64, (k, k)), jnp.int8)

            def body(_, xc):
                y = jax.lax.dot(xc, w, preferred_element_type=jnp.int32)
                return jax.lax.shift_right_arithmetic(
                    y, jnp.int32(7)).astype(jnp.int8)
        else:
            x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
            w = jnp.asarray(rng.standard_normal((k, k)), jnp.bfloat16)

            def body(_, xc):
                y = jax.lax.dot(xc, w, preferred_element_type=jnp.float32)
                return (y * 0.01).astype(jnp.bfloat16)

        @partial(jax.jit, static_argnums=1)
        def chain(x0, n):
            return jax.lax.fori_loop(0, n, body, x0)

        flops = 2.0 * m * k * k * iters
        times = []
        for rep in range(args.reps):
            t0 = time.perf_counter()
            out = chain(x, iters)
            _ = float(jnp.asarray(out, jnp.float32).sum())  # real fetch
            times.append(time.perf_counter() - t0)
        # rep 0 = compile + warm-up (discarded per CLAUDE.md)
        steady = times[1:]
        best = min(steady)
        row = {"name": name, "m": m, "k": k, "dtype": dtype, "iters": iters,
               "best_s": round(best, 4),
               "tops": round(flops / best / 1e12, 1),
               "all_s": [round(t, 4) for t in times]}
        rows.append(row)
        print(json.dumps(row), flush=True)

    run("vitb-tokens", 6304, 768, "bf16", args.iters)
    run("vitb-tokens", 6304, 768, "int8", args.iters)
    run("peak-4096", 4096, 4096, "bf16", max(args.iters // 4, 20))
    run("peak-4096", 4096, 4096, "int8", max(args.iters // 4, 20))
    print(json.dumps({"metric": "int8_vs_bf16_matmul", "rows": rows}))


if __name__ == "__main__":
    main()
