"""Compile each fused-attention kernel variant separately on the TPU to
isolate Mosaic failures. Usage: python tools/exp_kernel_bisect.py [b t d h f]"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from oatx.ops.pallas.divided_attention import _call_bwd, _call_fwd

    b, d, h, f, n = 8, 768, 12, 4, 196
    t = 1 + f * n
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * d)) * 0.1, jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((b, t, d)) * 0.1, jnp.bfloat16)

    for mode in ("space", "time"):
        for which, fn in (("fwd", lambda: _call_fwd(qkv, h, f, mode, False)),
                          ("bwd", lambda: _call_bwd(qkv, g, h, f, mode, False))):
            t0 = time.perf_counter()
            try:
                out = jax.jit(fn)()
                s = float(jnp.sum(out.astype(jnp.float32)))
                print(f"{mode}/{which}: OK compile+run {time.perf_counter()-t0:.1f}s "
                      f"sum={s:.3f} finite={np.isfinite(s)}", flush=True)
            except Exception as e:
                msg = str(e).split("\n")[0][:220]
                print(f"{mode}/{which}: FAIL {time.perf_counter()-t0:.1f}s {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
