"""Fused LayerNorm → fc1 → GELU → fc2 (ViT MLP) — Pallas TPU kernel.

Why this fusion and not LN→linear: XLA already folds layernorm affine into a
matmul prologue (measured: a Pallas LN+linear fusion is 0.9-1.05x of XLA,
tools/bench_ln_linear.py), but a dot feeding a dot ALWAYS materializes the
intermediate in HBM — for the ViT MLP that is the (B·T, 4D) hidden tensor,
a ~76 MB round trip per block at B=8/T=785/D=768 bf16, on a chip measured at
~70-100 GB/s effective HBM bandwidth (PERF.md §3). This kernel keeps the
hidden tensor in VMEM: per row tile it computes
    y = gelu(LN(x) @ W1 + b1) @ W2 + b2
reading x once and writing only y — ~28 MB total vs ~76+ MB for the XLA chain.

W1/W2 have constant index maps so Mosaic keeps them resident in VMEM across
the row grid (4.5 MB each at ViT-B sizes). GELU is the exact erf form
(reference video_transformer.py:35-51 nn.GELU), computed in f32.

Backward (custom_vjp): XLA matmuls (MXU) with stats recomputed from the saved
x — same structure autodiff would produce for the unfused chain, so training
numerics match; the win is the forward (and every remat re-forward).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_USE_PALLAS: Optional[bool] = None
_ROW_TILE = 256


def set_use_pallas(value: Optional[bool]) -> None:
    global _USE_PALLAS
    _USE_PALLAS = value


def use_pallas() -> bool:
    if _USE_PALLAS is not None:
        return _USE_PALLAS
    if jax.default_backend() != "tpu":
        return False
    # pallas_call has no GSPMD partitioning rule: under tensor parallelism it
    # would replicate the TP-sharded fc1/fc2 kernels per chip — fall back to
    # the XLA path whenever the registered mesh has a model axis (single
    # authority for this guard; callers need no special-casing)
    from oatx.parallel import mesh as meshlib

    m = meshlib.current_mesh()
    if m is not None and m.shape.get(meshlib.MODEL_AXIS, 1) > 1:
        return False
    return True


def _erf_approx(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7): Mosaic
    implements neither erf nor erfc, but exp is native on the VPU."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_f32(x):
    # exact-form GELU via the erf approximation above; |err| <= 7.5e-8·|x|,
    # far below both f32 test tolerances and bf16 resolution. Used ONLY inside
    # the Pallas kernel (Mosaic has no erf); XLA paths use _gelu_exact_f32.
    return 0.5 * x * (1.0 + _erf_approx(x * 0.7071067811865476))


def _gelu_exact_f32(x):
    # exact GELU (reference video_transformer.py:35-51 nn.GELU) — XLA paths
    # use lax.erf so the fwd and the bwd recompute are a consistent pair
    return 0.5 * x * (1.0 + jax.lax.erf(x * 0.7071067811865476))


def _kernel(x_ref, g_ref, bb_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref, *, eps):
    dt = x_ref.dtype
    xf = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    z = xc * jax.lax.rsqrt(var + eps)
    z = z * g_ref[:].astype(jnp.float32) + bb_ref[:].astype(jnp.float32)
    pre1 = jnp.dot(z.astype(dt), w1_ref[:], preferred_element_type=jnp.float32)
    h = _gelu_f32(pre1 + b1_ref[:].astype(jnp.float32))
    y = jnp.dot(h.astype(dt), w2_ref[:], preferred_element_type=jnp.float32)
    y_ref[:] = (y + b2_ref[:].astype(jnp.float32)).astype(y_ref.dtype)


def _fwd_pallas(x2d, gamma, beta, w1, b1, w2, b2, eps: float, row_tile: int,
                interpret: bool = False):
    rows, k = x2d.shape
    hid = w1.shape[1]
    n = w2.shape[1]
    grid = (pl.cdiv(rows, row_tile),)
    const = lambda i: (0, 0)  # noqa: E731 — resident operands
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((row_tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, hid), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, n), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, n), x2d.dtype),
    )(x2d, gamma[None, :], beta[None, :], w1, b1[None, :], w2, b2[None, :])


def _fwd_xla(x2d, gamma, beta, w1, b1, w2, b2, eps: float):
    dt = x2d.dtype
    xf = x2d.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    z = xc * jax.lax.rsqrt(var + eps)
    z = (z * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(dt)
    pre1 = jnp.dot(z, w1.astype(dt), preferred_element_type=jnp.float32)
    h = _gelu_exact_f32(pre1 + b1.astype(jnp.float32)).astype(dt)
    y = jnp.dot(h, w2.astype(dt), preferred_element_type=jnp.float32)
    return (y + b2.astype(jnp.float32)).astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _ln_mlp2d(x2d, gamma, beta, w1, b1, w2, b2, eps):
    if use_pallas():
        # cast master weights to the compute dtype in HBM before the kernel
        # (layers.linear semantics) — f32 weights alone would blow the ~16 MB
        # VMEM budget (observed 19.5 MB OOM in the real train step)
        return _fwd_pallas(x2d, gamma, beta, w1.astype(x2d.dtype), b1,
                           w2.astype(x2d.dtype), b2, eps, _ROW_TILE)
    return _fwd_xla(x2d, gamma, beta, w1, b1, w2, b2, eps)


def _ln_mlp2d_fwd(x2d, gamma, beta, w1, b1, w2, b2, eps):
    return _ln_mlp2d(x2d, gamma, beta, w1, b1, w2, b2, eps), (
        x2d, gamma, beta, w1, b1, w2)


def _ln_mlp2d_bwd(eps, res, dy):
    x2d, gamma, beta, w1, b1, w2 = res
    dt = x2d.dtype
    xf = x2d.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    u = xc * rstd
    z = (u * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(dt)
    pre1 = (jnp.dot(z, w1.astype(dt), preferred_element_type=jnp.float32)
            + b1.astype(jnp.float32))
    h = _gelu_exact_f32(pre1).astype(dt)

    dyf = dy.astype(jnp.float32)
    db2 = jnp.sum(dyf, axis=0)
    dw2 = jnp.dot(h.T, dy, preferred_element_type=jnp.float32)
    dh = jnp.dot(dy, w2.astype(dt).T, preferred_element_type=jnp.float32)
    # exact-gelu grad: d/dx [x·Φ(x)] = Φ(x) + x·φ(x)
    inv_sqrt2 = 0.7071067811865476
    phi = 0.5 * (1.0 + jax.lax.erf(pre1 * inv_sqrt2))
    pdf = jnp.exp(-0.5 * pre1 * pre1) * 0.3989422804014327
    dpre1 = (dh * (phi + pre1 * pdf)).astype(dt)
    db1 = jnp.sum(dpre1.astype(jnp.float32), axis=0)
    dw1 = jnp.dot(z.T, dpre1, preferred_element_type=jnp.float32)
    dz = jnp.dot(dpre1, w1.astype(dt).T, preferred_element_type=jnp.float32)
    dgamma = jnp.sum(dz * u, axis=0)
    dbeta = jnp.sum(dz, axis=0)
    du = dz * gamma.astype(jnp.float32)
    dx = rstd * (du - jnp.mean(du, axis=-1, keepdims=True)
                 - u * jnp.mean(du * u, axis=-1, keepdims=True))
    return (dx.astype(dt), dgamma.astype(jnp.float32), dbeta.astype(jnp.float32),
            dw1.astype(jnp.float32), db1, dw2.astype(jnp.float32), db2)


_ln_mlp2d.defvjp(_ln_mlp2d_fwd, _ln_mlp2d_bwd)


def ln_mlp(ln_params, mlp_params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Fused mlp(layer_norm(x)) in one HBM pass (drop-in for
    layers.mlp(mlp_params, layers.layer_norm(ln_params, x)))."""
    k = x.shape[-1]
    n = mlp_params["fc2"]["kernel"].shape[1]
    lead = x.shape[:-1]
    y = _ln_mlp2d(x.reshape(-1, k), ln_params["scale"], ln_params["bias"],
                  mlp_params["fc1"]["kernel"], mlp_params["fc1"]["bias"],
                  mlp_params["fc2"]["kernel"], mlp_params["fc2"]["bias"], eps)
    return y.reshape(*lead, n)
