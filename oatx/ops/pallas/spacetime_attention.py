"""Fused divided space attention — Pallas TPU kernel.

The hot op of the SpaceTimeTransformer (SURVEY.md §3.2): per frame, patch tokens
attend over [CLS + that frame's patches]; the CLS row attends over everything.
The XLA path (oatx.ops.attention.divided_attention) materializes the per-frame
logit/probability tensors in HBM; this kernel keeps them in VMEM — one grid
program per (batch, head) computes the CLS row plus all F frame groups with
f32 softmax on-chip, writing only the (T, Dh) output.

Backward: custom_vjp whose residual-free backward re-derives gradients through
the XLA reference implementation (mathematically the same function) — forward
throughput is what the kernel buys; the VJP stays autodiff-correct by
construction and is itself fused reasonably by XLA.

Layout contract: q, k, v are (B, T, H, Dh) with T = 1 + F·N, q pre-scaled by
head_dim^-0.5 (same contract as the XLA path).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _space_kernel(q_ref, k_ref, v_ref, o_ref, *, num_frames: int, n_per_frame: int):
    # refs are (1, 1, T, Dh) blocks of the (B, H, T, Dh) tensors → 2-D in VMEM
    qb = q_ref[0, 0]  # (T, Dh)
    kb = k_ref[0, 0]
    vb = v_ref[0, 0]

    # CLS row: attends over all T tokens.
    cls_logits = jnp.dot(qb[0:1], kb.T, preferred_element_type=jnp.float32)
    cls_logits -= jnp.max(cls_logits, axis=-1, keepdims=True)
    cls_p = jnp.exp(cls_logits)
    cls_p = cls_p / jnp.sum(cls_p, axis=-1, keepdims=True)
    o_ref[0, 0, 0:1, :] = jnp.dot(
        cls_p.astype(qb.dtype), vb, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)

    # Frame groups: queries = frame patches; keys = [CLS] + frame patches.
    for f in range(num_frames):
        lo = 1 + f * n_per_frame
        qf = qb[lo: lo + n_per_frame]                       # (N, Dh)
        kg = jnp.concatenate([kb[0:1], kb[lo: lo + n_per_frame]], axis=0)
        vg = jnp.concatenate([vb[0:1], vb[lo: lo + n_per_frame]], axis=0)
        logits = jnp.dot(qf, kg.T, preferred_element_type=jnp.float32)  # (N, N+1)
        logits -= jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, 0, lo: lo + n_per_frame, :] = jnp.dot(
            p.astype(qf.dtype), vg, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _space_attention_fwd_pallas(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_frames: int
) -> jnp.ndarray:
    b, t, h, dh = q.shape
    n = (t - 1) // num_frames
    assert 1 + num_frames * n == t
    kernel = functools.partial(_space_kernel, num_frames=num_frames, n_per_frame=n)
    spec = pl.BlockSpec((1, 1, t, dh), lambda bi, hi: (bi, hi, 0, 0),
                        memory_space=pltpu.VMEM)
    qt = q.transpose(0, 2, 1, 3)  # (B, H, T, Dh)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * (t + num_frames * n * (n + 1)) * dh,
            bytes_accessed=4 * b * t * h * dh * q.dtype.itemsize,
            transcendentals=b * h * (t + num_frames * n * (n + 1)),
        ),
    )(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)


def _space_attention_reference(q, k, v, num_frames):
    """XLA reference (same math as oatx.ops.attention space branch, on pre-split
    q/k/v) — used for the backward pass and as the CPU/interpret fallback."""
    b, t, h, dh = q.shape
    n = (t - 1) // num_frames
    f = num_frames
    cls_logits = jnp.einsum("bqhd,bkhd->bhqk", q[:, :1], k,
                            preferred_element_type=jnp.float32)
    cls_p = jax.nn.softmax(cls_logits, axis=-1).astype(q.dtype)
    cls_out = jnp.einsum("bhqk,bkhd->bqhd", cls_p, v,
                         preferred_element_type=jnp.float32).astype(q.dtype)
    qp = q[:, 1:].reshape(b, f, n, h, dh)
    kp = k[:, 1:].reshape(b, f, n, h, dh)
    vp = v[:, 1:].reshape(b, f, n, h, dh)
    kg = jnp.concatenate(
        [jnp.broadcast_to(k[:, None, :1], (b, f, 1, h, dh)), kp], axis=2)
    vg = jnp.concatenate(
        [jnp.broadcast_to(v[:, None, :1], (b, f, 1, h, dh)), vp], axis=2)
    logits = jnp.einsum("bfqhd,bfkhd->bfhqk", qp, kg,
                        preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bfhqk,bfkhd->bfqhd", p, vg,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return jnp.concatenate([cls_out, out.reshape(b, f * n, h, dh)], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def space_attention(q, k, v, num_frames: int):
    """Fused divided space attention. q pre-scaled; shapes (B, T, H, Dh)."""
    return _space_attention_fwd_pallas(q, k, v, num_frames)


def _fwd(q, k, v, num_frames):
    return space_attention(q, k, v, num_frames), (q, k, v)


def _bwd(num_frames, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _space_attention_reference(a, b, c, num_frames),
                     q, k, v)
    return vjp(g)


space_attention.defvjp(_fwd, _bwd)


def use_pallas() -> bool:
    """Default: disabled.

    Measured on the v5e dev chip (B=16, T=785, H=12, Dh=64, bf16): this kernel
    runs ~37 ms/op vs ~2.9 ms/op for the XLA einsum path after its layout fix
    (oatx.ops.attention time-branch N-minor formulation) — the (B·H)-program
    grid amortizes poorly at these tiny per-group shapes and Mosaic's
    compile time is prohibitive (~220 s). Kept as an explicit opt-in
    (oatx.ops.attention.set_use_pallas(True)) and as the substrate for future
    fusion work (LN+qkv+attention in one kernel); enable only after profiling
    shows a win on the target topology.
    """
    return False
