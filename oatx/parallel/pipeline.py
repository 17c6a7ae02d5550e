"""GPipe-style pipeline parallelism over a stacked block sequence (TPU-native:
shard_map + lax.ppermute over the mesh's model axis).

The video tower stacks its transformer blocks on a leading depth axis
(vit_spacetime.init), which is exactly the layout pipeline parallelism wants:
stage s holds blocks [s·L/P, (s+1)·L/P) and microbatches flow through the
stages over ICI via ppermute. The classic schedule: with M microbatches and P
stages, tick t has stage s working on microbatch t-s (bubble at the ends),
M + P - 1 ticks total.

This is an ALTERNATIVE use of the 'model' mesh axis (mutually exclusive with
Megatron tensor parallelism, which shards the matmuls over the same axis):
`trainer.pipeline` flips the parameter layout from TP kernel sharding to
depth sharding and routes vit_spacetime.apply through pipeline_blocks.

Differentiable end-to-end (shard_map + ppermute have transposes), so the same
code path serves training; activations for the backward are the standard
GPipe per-microbatch stash that remat can shrink.

The reference has nothing comparable (DDP only — SURVEY.md §2.5); this is the
scaling-book pipelining recipe expressed in jax.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from oatx.parallel.mesh import MODEL_AXIS, batch_axes, batch_shards


def stage_block_specs(params_blocks: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpecs sharding the stacked-depth leading axis over the model
    axis (pipeline stages own contiguous block ranges)."""
    return jax.tree_util.tree_map(
        lambda leaf: P(MODEL_AXIS, *([None] * (leaf.ndim - 1))), params_blocks)


def pipeline_blocks(
    mesh: Mesh,
    block_fn: Callable[[Dict[str, Any], jnp.ndarray], jnp.ndarray],
    params_blocks: Dict[str, Any],
    x: jnp.ndarray,
    num_stages: int,
    microbatches: int,
) -> jnp.ndarray:
    """Run x (B, T, D) through the depth-stacked blocks, pipelined over
    `num_stages` = model-axis size with `microbatches` GPipe microbatches.

    params_blocks leaves are (L, ...) with L % num_stages == 0; each stage
    applies its local L/P blocks with a lax.scan. x's batch must divide by
    microbatches (and stay divisible by the data axis afterwards). Numerics
    are identical to the sequential scan — the schedule only reorders
    independent microbatches.
    """
    B = x.shape[0]
    P_ = num_stages
    M = microbatches
    assert B % M == 0, f"batch {B} not divisible by {M} microbatches"
    L = jax.tree_util.tree_leaves(params_blocks)[0].shape[0]
    assert L % P_ == 0, f"depth {L} not divisible by {P_} stages"

    mb = B // M
    data_size = batch_shards(mesh)  # dcn x data on multi-slice meshes
    assert mb % data_size == 0, (
        f"microbatch size {mb} (batch {B} / {M} microbatches) must divide by "
        f"the batch shards ({data_size})")
    x_micro = x.reshape(M, mb, *x.shape[1:])

    def run(blocks_local, x_micro_local):
        # inside shard_map: blocks_local leaves are (L/P, ...); x_micro_local
        # is (M, mb/data, T, D), identical on every stage (replicated over
        # the model axis)
        stage = jax.lax.axis_index(MODEL_AXIS)

        def stage_apply(h):
            def body(hh, bp):
                return block_fn(bp, hh), None

            out, _ = jax.lax.scan(body, h, blocks_local)
            return out

        state = jnp.zeros_like(x_micro_local[0])
        # collected last-stage outputs, microbatch-major
        collected = jnp.zeros_like(x_micro_local)

        def tick(carry, t):
            state, collected = carry
            # stage 0 injects microbatch t (clamped; drain-tick recomputes of
            # the last microbatch never reach the collect window)
            inj = x_micro_local[jnp.minimum(t, M - 1)]
            h = jnp.where(stage == 0, inj, state)
            out = stage_apply(h)
            # last stage finished microbatch t - (P-1) this tick
            done_idx = t - (P_ - 1)
            keep = (done_idx >= 0).astype(out.dtype)
            slot = jnp.maximum(done_idx, 0)
            prev = jax.lax.dynamic_index_in_dim(collected, slot, axis=0,
                                                keepdims=False)
            collected = jax.lax.dynamic_update_index_in_dim(
                collected, keep * out + (1 - keep) * prev, slot, axis=0)
            # rotate: stage s's output becomes stage s+1's next input
            state = jax.lax.ppermute(
                out, MODEL_AXIS, [(i, (i + 1) % P_) for i in range(P_)])
            return (state, collected), None

        # lax.scan (not fori_loop): the pipeline must be reverse-differentiable
        (_, collected), _ = jax.lax.scan(
            tick, (state, collected), jnp.arange(M + P_ - 1))
        # `collected` is only valid on the LAST stage; broadcast it to every
        # stage so the replicated-over-model output contract holds
        out = jnp.where(stage == P_ - 1, collected, jnp.zeros_like(collected))
        out = jax.lax.psum(out, MODEL_AXIS)
        return out

    from jax import shard_map

    nd = x.ndim  # x_micro has ndim + 1 dims: (M, mb, ...)
    fn = shard_map(
        run,
        mesh=mesh,
        in_specs=(stage_block_specs(params_blocks),
                  Pspec_data_micro(nd, mesh)),
        out_specs=Pspec_data_micro(nd, mesh),
        check_vma=False,  # ppermute/psum manual collectives
    )
    out = fn(params_blocks, x_micro)
    return out.reshape(B, *x.shape[1:])


def Pspec_data_micro(x_ndim: int, mesh: Mesh) -> P:
    """(M, mb, T, D...) spec: microbatch dim replicated, batch dim over the
    mesh's batch axes (('dcn',) 'data' — shard_map replicates axes its specs
    do not name, so the multi-slice axis must be named explicitly)."""
    return P(None, batch_axes(mesh), *([None] * (x_ndim - 2)))
