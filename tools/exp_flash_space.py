"""Experiment: stock TPU flash-attention kernel for the divided-space branch.

The XLA space branch costs 4.0 ms fwd+bwd vs a ~1.9 ms matmul floor
(tools/bench_attention.py) — the gap is softmax-backward HBM traffic
(p/dp/dlogits round trips). Flash never materializes p. Space groups are
(q=196 patches, kv=197 = CLS+patches) per (batch, frame): pad both to 256,
mask padded kv columns with an additive bias, slice padded q rows off the
output (their cotangents are zero, so they cannot pollute dk/dv).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_flash_space.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timed(fn, *args, iters=30):
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
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    from oatx.ops import attention as attn
    from oatx.models import vit_spacetime as vst

    B, F, N, D, H = 8, 4, 196, 768, 12
    Dh = D // H
    T = 1 + F * N
    PAD = 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, D)) * 0.1, jnp.bfloat16)
    cfg = vst.SpaceTimeViTConfig(num_frames=F)
    bp = vst._init_block(jax.random.PRNGKey(0), cfg)
    print(f"backend={jax.default_backend()}")

    # baseline: current XLA path
    f_x = lambda xx: attn.divided_attention(bp["attn"], xx, H, F,
                                            mode="space", cls_pos="last")
    t = timed(f_x, x)
    tg = timed(lambda xx: jax.grad(
        lambda v: f_x(v).astype(jnp.float32).sum())(xx), x)
    print(f"XLA space: fwd {t*1e3:6.3f} ms | fwd+bwd {tg*1e3:6.3f} ms")

    # flash formulation (patch groups only; CLS row stays on the XLA path)
    kv_real = N + 1
    # mask padded kv columns via segment ids (a full-shape additive bias
    # would be a 100 MB tensor — worse than the traffic being saved)
    q_seg = jnp.zeros((B * F, PAD), jnp.int32)
    kv_seg = jnp.concatenate(
        [jnp.zeros((B * F, kv_real), jnp.int32),
         jnp.ones((B * F, PAD - kv_real), jnp.int32)], axis=1)
    segs = fa.SegmentIds(q=q_seg, kv=kv_seg)

    def flash_groups(xx):
        q, k, v = attn._qkv(bp["attn"], xx, H)          # (B, T, H, Dh), q scaled
        qp = q[:, :-1].reshape(B, F, N, H, Dh)
        kp = k[:, :-1].reshape(B, F, N, H, Dh)
        vp = v[:, :-1].reshape(B, F, N, H, Dh)
        cls_k = k[:, -1:]
        cls_v = v[:, -1:]
        kg = jnp.concatenate(
            [jnp.broadcast_to(cls_k[:, None], (B, F, 1, H, Dh)), kp], axis=2)
        vg = jnp.concatenate(
            [jnp.broadcast_to(cls_v[:, None], (B, F, 1, H, Dh)), vp], axis=2)
        # (B·F, H, seq, Dh), padded
        qf = jnp.zeros((B * F, H, PAD, Dh), xx.dtype)
        qf = qf.at[:, :, :N].set(qp.reshape(B * F, N, H, Dh).transpose(0, 2, 1, 3))
        kf = jnp.zeros((B * F, H, PAD, Dh), xx.dtype)
        kf = kf.at[:, :, :kv_real].set(
            kg.reshape(B * F, kv_real, H, Dh).transpose(0, 2, 1, 3))
        vf = jnp.zeros((B * F, H, PAD, Dh), xx.dtype)
        vf = vf.at[:, :, :kv_real].set(
            vg.reshape(B * F, kv_real, H, Dh).transpose(0, 2, 1, 3))
        o = fa.flash_attention(qf, kf, vf, segment_ids=segs, sm_scale=1.0)
        o = o[:, :, :N].transpose(0, 2, 1, 3).reshape(B, F * N, D)
        return o

    t = timed(flash_groups, x)
    tg = timed(lambda xx: jax.grad(
        lambda v: flash_groups(v).astype(jnp.float32).sum())(xx), x)
    print(f"flash space (padded 256): fwd {t*1e3:6.3f} ms | fwd+bwd {tg*1e3:6.3f} ms")

    # numerics check vs the XLA group computation (patch rows only)
    want = f_x(x)[:, :-1]  # drop CLS row
    # the XLA path includes proj; recompute without proj for comparison
    def xla_groups(xx):
        q, k, v = attn._qkv(bp["attn"], xx, H)
        qp = q[:, :-1].reshape(B, F, N, H, Dh)
        kp = k[:, :-1].reshape(B, F, N, H, Dh)
        vp = v[:, :-1].reshape(B, F, N, H, Dh)
        cls_k, cls_v = k[:, -1:], v[:, -1:]
        kg = jnp.concatenate(
            [jnp.broadcast_to(cls_k[:, None], (B, F, 1, H, Dh)), kp], axis=2)
        vg = jnp.concatenate(
            [jnp.broadcast_to(cls_v[:, None], (B, F, 1, H, Dh)), vp], axis=2)
        logits = jnp.einsum("bfqhd,bfkhd->bfhqk", qp, kg,
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits, axis=-1).astype(xx.dtype)
        out = jnp.einsum("bfhqk,bfkhd->bfqhd", p, vg,
                         preferred_element_type=jnp.float32)
        return out.astype(xx.dtype).reshape(B, F * N, D)

    a = np.asarray(flash_groups(x), np.float32)
    b = np.asarray(xla_groups(x), np.float32)
    print(f"max |flash - xla| = {np.abs(a - b).max():.2e}")


if __name__ == "__main__":
    main()
