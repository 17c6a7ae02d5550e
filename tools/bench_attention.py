"""Microbench: divided space/time attention cost vs matmul-bound floor.

Times each sublayer of the ViT block at train shapes (B=8, T=785, D=768)
fwd and fwd+bwd, next to its pure-matmul content, to locate non-matmul
overhead (PERF.md round 2 — the fwd gap between 30.6 ms measured and ~23 ms
matmul-bound).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_attention.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from oatx.models import vit_spacetime as vst
from oatx.ops import attention as attn


def timed(fn, *args, iters=50):
    def chain(x, rest):
        def body(c, _):
            y = fn(c, *rest)
            return c + (y.astype(jnp.float32).sum() * 1e-12).astype(c.dtype), None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out.astype(jnp.float32).sum()

    jitted = jax.jit(lambda x, *rest: chain(x, rest))
    float(jitted(*args))
    t0 = time.time()
    float(jitted(*args))
    return (time.time() - t0) / iters


def main():
    B, F, N, D, H = 8, 4, 196, 768, 12
    T = 1 + F * N
    rng = np.random.default_rng(0)
    cfg = vst.SpaceTimeViTConfig(num_frames=F)
    bp = jax.tree_util.tree_map(
        lambda x: x, vst._init_block(jax.random.PRNGKey(0), cfg))
    x = jnp.asarray(rng.standard_normal((B, T, D)) * 0.1, jnp.bfloat16)
    print(f"backend={jax.default_backend()} B={B} T={T} D={D}")

    for mode in ("space", "time"):
        f_fwd = lambda x, m=mode: attn.divided_attention(
            bp["attn"], x, H, F, mode=m, cls_pos="last")
        t = timed(f_fwd, x)
        f_bwd = lambda x, m=mode: jax.grad(
            lambda xx: attn.divided_attention(
                bp["attn"], xx, H, F, mode=m, cls_pos="last")
            .astype(jnp.float32).sum())(x)
        tg = timed(f_bwd, x)
        print(f"{mode:5s} attention: fwd {t*1e3:6.3f} ms | fwd+bwd {tg*1e3:6.3f} ms")

    # matmul content of one attention sublayer: qkv + proj
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) / 27.7, jnp.bfloat16)
    wp = jnp.asarray(rng.standard_normal((D, D)) / 27.7, jnp.bfloat16)

    def mm(x, wqkv, wp):
        q = jnp.dot(x.reshape(-1, D), wqkv, preferred_element_type=jnp.bfloat16)
        return jnp.dot(q[:, :D], wp, preferred_element_type=jnp.bfloat16)

    t = timed(mm, x, wqkv, wp)
    print(f"matmul floor (qkv+proj): fwd {t*1e3:6.3f} ms")

    # whole block
    fb = lambda x: vst._block_apply(cfg, bp, x, F)
    t = timed(fb, x)
    tg = timed(lambda x: jax.grad(
        lambda xx: vst._block_apply(cfg, bp, xx, F).astype(jnp.float32).sum())(x), x)
    print(f"full block: fwd {t*1e3:6.3f} ms | fwd+bwd {tg*1e3:6.3f} ms "
          f"(x12 blocks = {tg*12e3:.1f} ms)")


if __name__ == "__main__":
    main()
