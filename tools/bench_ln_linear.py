"""Microbench: fused Pallas LN→Linear vs XLA LN→matmul on the real chip.

Methodology per CLAUDE.md: chain iterations inside one jit (lax.scan) and end
with a scalar fetch — block_until_ready returns early through the axon relay.

    python tools/bench_ln_linear.py [--iters 50] [--rows 6280]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from oatx.ops.pallas import ln_linear as ll


def timed(fn, *args, iters):
    # chaining: x' = x + output-dependent scalar, so scan can't parallelize
    def chain(x, rest):
        def body(c, _):
            y = fn(c, *rest)
            return c + (y.astype(jnp.float32).sum() * 1e-12).astype(c.dtype), None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out.astype(jnp.float32).sum()

    jitted = jax.jit(lambda x, *rest: chain(x, rest))
    r = float(jitted(*args))  # compile + warm
    t0 = time.time()
    r = float(jitted(*args))
    dt = (time.time() - t0) / iters
    return dt, r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--rows", type=int, default=6280)  # B=8 × T=785
    ap.add_argument("--k", type=int, default=768)
    ap.add_argument("--grad", action="store_true", help="benchmark fwd+bwd")
    ap.add_argument("--tiles", type=str, default="",
                    help="comma-separated row tiles to sweep for the fused kernel")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    K = args.k
    print(f"backend={jax.default_backend()} rows={args.rows} K={K}")
    for N, tag in ((3 * K, "qkv"), (4 * K, "fc1")):
        x = jnp.asarray(rng.standard_normal((args.rows, K)), jnp.bfloat16)
        gamma = jnp.asarray(1 + 0.1 * rng.standard_normal(K), jnp.float32)
        beta = jnp.asarray(0.1 * rng.standard_normal(K), jnp.float32)
        w = jnp.asarray(rng.standard_normal((K, N)) / np.sqrt(K), jnp.bfloat16)
        b = jnp.asarray(0.1 * rng.standard_normal(N), jnp.float32)

        bytes_x = args.rows * K * 2
        flops = 2 * args.rows * K * N

        if args.grad:
            def xla_fn(x, g, bt, w, b):
                return jax.grad(lambda xx: ll._fwd_xla(xx, g, bt, w, b, 1e-6)
                                .astype(jnp.float32).sum())(x)

            def fused_fn(x, g, bt, w, b):
                return jax.grad(lambda xx: ll._ln_linear2d(xx, g, bt, w, b, 1e-6)
                                .astype(jnp.float32).sum())(x)
        else:
            def xla_fn(x, g, bt, w, b):
                return ll._fwd_xla(x, g, bt, w, b, 1e-6)

            def fused_fn(x, g, bt, w, b):
                return ll._fwd_pallas(x, g, bt, w, b, 1e-6, ll._ROW_TILE)

        t_xla, _ = timed(xla_fn, x, gamma, beta, w, b, iters=args.iters)
        mode = "fwd+bwd" if args.grad else "fwd"
        if args.tiles and not args.grad:
            for tile in (int(t) for t in args.tiles.split(",")):
                def fused_tile(x, g, bt, w, b, _tile=tile):
                    return ll._fwd_pallas(x, g, bt, w, b, 1e-6, _tile)
                t_f, _ = timed(fused_tile, x, gamma, beta, w, b, iters=args.iters)
                print(f"{tag} N={N} [fwd] tile={tile:5d} xla {t_xla*1e3:7.3f} ms |"
                      f" fused {t_f*1e3:7.3f} ms | {t_xla/t_f:5.2f}x")
            continue
        t_fused, _ = timed(fused_fn, x, gamma, beta, w, b, iters=args.iters)
        print(f"{tag} N={N} [{mode}] xla {t_xla*1e3:7.3f} ms | fused {t_fused*1e3:7.3f} ms"
              f" | {t_xla/t_fused:5.2f}x | xla {flops/t_xla/1e12:5.1f} TF/s"
              f" | act {bytes_x/1e6:.1f} MB")


if __name__ == "__main__":
    main()


def bench_mlp(rows=6280, k=768, iters=50, grad=False, tiles=(256,)):
    """python -c 'import tools.bench_ln_linear as b; b.bench_mlp()'"""
    from oatx.ops.pallas import ln_mlp as lm

    rng = np.random.default_rng(0)
    hid = 4 * k
    x = jnp.asarray(rng.standard_normal((rows, k)), jnp.bfloat16)
    gamma = jnp.asarray(1 + 0.1 * rng.standard_normal(k), jnp.float32)
    beta = jnp.asarray(0.1 * rng.standard_normal(k), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((k, hid)) / np.sqrt(k), jnp.bfloat16)
    b1 = jnp.asarray(0.1 * rng.standard_normal(hid), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((hid, k)) / np.sqrt(hid), jnp.bfloat16)
    b2 = jnp.asarray(0.1 * rng.standard_normal(k), jnp.float32)
    print(f"backend={jax.default_backend()} MLP rows={rows} K={k} hid={hid} grad={grad}")

    if grad:
        def xla_fn(x, *r):
            return jax.grad(lambda xx: lm._fwd_xla(xx, *r, 1e-6)
                            .astype(jnp.float32).sum())(x)

        def fused_fn(x, *r):
            return jax.grad(lambda xx: lm._ln_mlp2d(xx, *r, 1e-6)
                            .astype(jnp.float32).sum())(x)

        t_xla, _ = timed(xla_fn, x, gamma, beta, w1, b1, w2, b2, iters=iters)
        t_fused, _ = timed(fused_fn, x, gamma, beta, w1, b1, w2, b2, iters=iters)
        print(f"fwd+bwd xla {t_xla*1e3:7.3f} ms | fused {t_fused*1e3:7.3f} ms"
              f" | {t_xla/t_fused:5.2f}x")
        return

    def xla_fn(x, *r):
        return lm._fwd_xla(x, *r, 1e-6)

    t_xla, _ = timed(xla_fn, x, gamma, beta, w1, b1, w2, b2, iters=iters)
    for tile in tiles:
        def fused_fn(x, *r, _tile=tile):
            return lm._fwd_pallas(x, *r, 1e-6, _tile)
        t_fused, _ = timed(fused_fn, x, gamma, beta, w1, b1, w2, b2, iters=iters)
        print(f"fwd tile={tile:5d} xla {t_xla*1e3:7.3f} ms | fused {t_fused*1e3:7.3f} ms"
              f" | {t_xla/t_fused:5.2f}x")
