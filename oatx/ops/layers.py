"""Primitive layer ops (XLA path).

Conventions (TPU/JAX-idiomatic, NOT torch layouts):
  * linear kernels are stored (in_features, out_features) — torch weights must be
    transposed on import (see oatx.models.convert);
  * convolutions are NHWC with HWIO kernels;
  * layernorm/softmax statistics are computed in float32 regardless of compute dtype
    (bf16-safe), outputs cast back.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# A/B experiment hook (PERF.md round 5): OATX_LN_STATS_BF16=1 computes LN
# statistics in the input dtype instead of f32. NOT a shipped default — the
# f32-stats convention is a numerical-safety invariant; this exists to put a
# measured number on what the upcast costs (expected ~nothing: LN fuses into
# matmul prologues, PERF.md round 2).
_LN_STATS_IN_DTYPE = os.environ.get("OATX_LN_STATS_BF16") == "1"


def linear(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.matmul(x, params["kernel"].astype(x.dtype))
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(x.dtype)
    return y


def layer_norm(params: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x if _LN_STATS_IN_DTYPE else x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + jnp.asarray(eps, xf.dtype))
    y = y * params["scale"].astype(xf.dtype) + params["bias"].astype(xf.dtype)
    return y.astype(x.dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — matches torch nn.GELU / HF DistilBERT."""
    return jax.nn.gelu(x, approximate=False)


def mlp(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """fc1 → GELU → fc2 (ViT Mlp; reference video_transformer.py:35-51)."""
    return linear(params["fc2"], gelu(linear(params["fc1"], x)))


def patch_embed_conv(params: Params, images: jnp.ndarray, patch_size: int = 16) -> jnp.ndarray:
    """Non-overlapping patch embedding: NHWC images → (B, H/p * W/p, D) tokens.

    Equivalent to the reference Conv2d(k=p, s=p) patch embed
    (video_transformer.py:54-76); token order is row-major over (h, w), identical to
    torch's flatten(2).transpose(2, 1).
    """
    kernel = params["kernel"].astype(images.dtype)  # (p, p, C, D)
    y = jax.lax.conv_general_dilated(
        images,
        kernel,
        window_strides=(patch_size, patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in params:
        y = y + params["bias"].astype(images.dtype)
    b, h, w, d = y.shape
    return y.reshape(b, h * w, d)


def embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(table, ids, axis=0)
