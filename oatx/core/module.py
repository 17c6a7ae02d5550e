"""Functional module utilities.

oatx models are pure functions over explicit parameter pytrees (nested dicts of
jnp arrays). Identical transformer blocks are *stacked* along a leading depth axis and
iterated with `lax.scan` — the TPU-idiomatic shape: one compiled block body, O(1)
compile time in depth, and trivially shardable leaves.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def trunc_normal(rng: jax.Array, shape, std: float = 0.02, dtype=jnp.float32) -> jnp.ndarray:
    """Truncated normal in (-2σ, 2σ), matching timm's trunc_normal_(std=.02)."""
    return std * jax.random.truncated_normal(rng, -2.0, 2.0, shape, dtype)


def lecun_normal(rng: jax.Array, shape, fan_in: int, dtype=jnp.float32) -> jnp.ndarray:
    return jax.random.normal(rng, shape, dtype) * jnp.sqrt(1.0 / fan_in)


def split_rngs(rng: jax.Array, n: int) -> List[jax.Array]:
    return list(jax.random.split(rng, n))


def stack_params(blocks: List[Params]) -> Params:
    """[block0, block1, ...] → single pytree with leaves stacked on axis 0."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *blocks)


def unstack_params(stacked: Params, depth: int) -> List[Params]:
    return [jax.tree_util.tree_map(lambda x: x[i], stacked) for i in range(depth)]


def layer_slice(stacked: Params, i) -> Params:
    """Dynamic slice of one layer out of stacked block params (scan-friendly)."""
    return jax.tree_util.tree_map(lambda x: x[i], stacked)


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def cast_floating(tree: Params, dtype) -> Params:
    """Cast floating-point leaves (e.g. to bf16 for compute); ints untouched."""
    def _cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(_cast, tree)


def dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate: float, deterministic: bool) -> jnp.ndarray:
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
