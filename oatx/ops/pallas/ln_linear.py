"""LayerNorm → Linear as one custom-VJP op (XLA forward, hand-written backward).

Measured on the dev chip (PERF.md round 2): the FORWARD is matmul-bound — XLA
already folds the LN affine into the matmul prologue, and a Pallas fused
forward runs 0.82-0.96x of XLA at ViT-B shapes. The win is the BACKWARD:
XLA autodiff of the LN→matmul chain spends ~25% more than the lean VJP below
(1.125 vs 0.902 ms fwd+bwd for LN→qkv at B·T=6280, K=768), which recomputes
the stats from the saved x instead of keeping the normalized tensor alive,
and keeps exactly four matmuls (dW, dz, and the forward pair). So the default
path is pure XLA both directions (GSPMD/TP-sharding friendly); the Pallas
forward kernel is retained behind set_use_pallas(True) for re-measurement on
topologies with a different bandwidth:compute ratio.

Numerics match ops.layers.layer_norm → linear in structure: f32 statistics,
affine in f32, matmul inputs cast to the compute dtype, f32 accumulation,
bias in f32 (layers.py conventions; reference semantics
video_transformer.py:35-51, 228-266).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# toggle: None = auto (TPU only), True/False = forced.
_USE_PALLAS: Optional[bool] = None
_ROW_TILE = 256


def set_use_pallas(value: Optional[bool]) -> None:
    global _USE_PALLAS
    _USE_PALLAS = value


def use_pallas() -> bool:
    """True only when explicitly opted in (set_use_pallas(True)): the Pallas
    forward measured 0.82-1.07x of XLA, so the default dispatch is XLA on
    every backend (mirrors _ln_linear2d's actual branch)."""
    return bool(_USE_PALLAS)


def _kernel(x_ref, g_ref, bb_ref, w_ref, b_ref, y_ref, *, eps: float):
    xf = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    z = xc * jax.lax.rsqrt(var + eps)
    z = z * g_ref[:].astype(jnp.float32) + bb_ref[:].astype(jnp.float32)
    y = jnp.dot(z.astype(x_ref.dtype), w_ref[:], preferred_element_type=jnp.float32)
    y_ref[:] = (y + b_ref[:].astype(jnp.float32)).astype(y_ref.dtype)


def _fwd_pallas(x2d, gamma, beta, w, b, eps: float, row_tile: int,
                interpret: bool = False):
    rows, k = x2d.shape
    n = w.shape[1]
    grid = (pl.cdiv(rows, row_tile),)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((row_tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, n), x2d.dtype),
    )(x2d, gamma[None, :], beta[None, :], w, b[None, :])


def _fwd_xla(x2d, gamma, beta, w, b, eps: float):
    xf = x2d.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    z = xc * jax.lax.rsqrt(var + eps)
    z = (z * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x2d.dtype)
    y = jnp.dot(z, w.astype(x2d.dtype), preferred_element_type=jnp.float32)
    return (y + b.astype(jnp.float32)).astype(x2d.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _ln_linear2d(x2d, gamma, beta, w, b, eps):
    # forward stays on XLA: the Pallas forward measured 0.82-0.96x of XLA at
    # ViT-B shapes (PERF.md); the hand-written VJP below is the win (1.25x on
    # fwd+bwd vs autodiff: 0.902 vs 1.125 ms for LN->qkv). Pure-XLA both ways
    # also means GSPMD TP sharding works unchanged. _fwd_pallas remains for
    # re-measurement on other topologies (set_use_pallas(True)).
    if _USE_PALLAS:
        # cast master weights to the compute dtype before the kernel (mirrors
        # ln_mlp and the XLA forward's w.astype; halves kernel VMEM and keeps
        # the custom bwd's z @ w.astype(dt) numerics consistent)
        return _fwd_pallas(x2d, gamma, beta, w.astype(x2d.dtype), b, eps,
                           _ROW_TILE)
    return _fwd_xla(x2d, gamma, beta, w, b, eps)


def _ln_linear2d_fwd(x2d, gamma, beta, w, b, eps):
    return _ln_linear2d(x2d, gamma, beta, w, b, eps), (x2d, gamma, beta, w)


def _ln_linear2d_bwd(eps, res, dy):
    x2d, gamma, beta, w = res
    dt = x2d.dtype
    xf = x2d.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    u = xc * rstd                                           # normalized, pre-affine
    z = (u * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(dt)

    db = jnp.sum(dy.astype(jnp.float32), axis=0)
    dw = jnp.dot(z.T, dy, preferred_element_type=jnp.float32)
    dz = jnp.dot(dy, w.astype(dt).T, preferred_element_type=jnp.float32)
    dgamma = jnp.sum(dz * u, axis=0)
    dbeta = jnp.sum(dz, axis=0)
    du = dz * gamma.astype(jnp.float32)
    # LN backward: dx = rstd * (du - mean(du) - u * mean(du * u))
    dx = rstd * (du - jnp.mean(du, axis=-1, keepdims=True)
                 - u * jnp.mean(du * u, axis=-1, keepdims=True))
    return (dx.astype(dt), dgamma.astype(jnp.float32), dbeta.astype(jnp.float32),
            dw.astype(jnp.float32), db)


_ln_linear2d.defvjp(_ln_linear2d_fwd, _ln_linear2d_bwd)


def ln_linear(ln_params, lin_params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Fused layer_norm(ln_params, x) @ lin_params in one HBM pass.

    x: (..., K) — leading dims are flattened to rows for the kernel.
    ln_params: {'scale', 'bias'}; lin_params: {'kernel' (K, N), 'bias' (N,)}.
    Drop-in replacement for layers.linear(lin, layers.layer_norm(ln, x)).
    """
    k = x.shape[-1]
    n = lin_params["kernel"].shape[1]
    lead = x.shape[:-1]
    x2d = x.reshape(-1, k)
    y = _ln_linear2d(x2d, ln_params["scale"], ln_params["bias"],
                     lin_params["kernel"], lin_params["bias"], eps)
    return y.reshape(*lead, n)
