"""Parameter sharding rules (GSPMD).

Megatron-style tensor parallelism for the transformer kernels, expressed purely as
sharding annotations — XLA inserts the all-reduce after the second MLP/attention
matmul. Rules are name-based over the oatx param trees (which stack blocks on a
leading depth axis, so kernel shapes are (L, in, out)):

  fc1 / lin1 / qkv kernels → shard the OUT dim over 'model' (column parallel)
  fc2 / lin2 / proj / out  → shard the IN dim over 'model'  (row parallel)
  embedding tables (vocab) → shard the vocab dim over 'model'
  everything else          → replicated

With model-axis size 1 these all collapse to replication (pure DP). Optimizer state
inherits the same specs (optax states mirror the param tree).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from oatx.parallel.mesh import DATA_AXIS, MODEL_AXIS

_COL_PARALLEL = ("fc1", "lin1", "qkv", "q", "k", "v", "intermediate")
_ROW_PARALLEL = ("fc2", "lin2", "proj", "out", "output")


def _spec_for(path: Tuple[str, ...], leaf) -> P:
    names = [p for p in path]
    leafname = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""
    if leafname == "kernel":
        ndim = leaf.ndim
        if parent in _COL_PARALLEL:
            return P(*([None] * (ndim - 1)), MODEL_AXIS)
        if parent in _ROW_PARALLEL:
            return P(*([None] * (ndim - 2)), MODEL_AXIS, None)
    if leafname == "word" and leaf.ndim == 2:  # vocab embedding table
        return P(MODEL_AXIS, None)
    return P()


def param_specs(params: Dict[str, Any], mesh: Mesh = None) -> Dict[str, Any]:
    """PartitionSpec pytree matching `params`. When a mesh is given, any leaf
    whose sharded dimension is not divisible by the model-axis size falls back
    to replication (explicit device_put requires even shards)."""
    model_size = mesh.shape[MODEL_AXIS] if mesh is not None else 1

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        spec = _spec_for(path, tree)
        if mesh is not None and model_size > 1:
            for dim, axis in enumerate(spec):
                if axis == MODEL_AXIS and tree.shape[dim] % model_size != 0:
                    return P()
        return spec

    return walk(params, ())


def param_shardings(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), param_specs(params, mesh),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    sh = param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, sh)


def fsdp_param_specs(
    params: Dict[str, Any], mesh: Mesh, min_size: int = 2 ** 16
) -> Dict[str, Any]:
    """FSDP-style (ZeRO-3 analogue) parameter sharding, pure GSPMD: every
    sizeable leaf additionally shards ONE dimension over the DATA axis (the
    first divisible dim the Megatron model-axis rules left free). XLA inserts
    the all-gather at each use and the reduce-scatter on the gradient — the
    weight-gathered FSDP schedule — so per-chip HBM for params AND their Adam
    moments drops to ~1/data_size. Leaves smaller than min_size stay on the
    base spec (gather latency would dominate). Composes with tensor
    parallelism: a leaf can end up P(..., 'data', ..., 'model', ...).
    On a multi-slice ('dcn') mesh the 'dcn' axis is DELIBERATELY left out:
    params replicate across slices so the per-use weight all-gathers ride
    intra-slice ICI, never DCN — cross-slice traffic stays the one gradient
    reduce (the scaling-book multi-slice recipe).
    SURVEY.md §2.5 lists optimizer sharding as the pjit freebie; this is the
    same mechanism one annotation further."""
    data_size = mesh.shape[DATA_AXIS]
    base = param_specs(params, mesh)

    def upgrade(leaf, spec):
        if data_size <= 1 or not hasattr(leaf, "ndim") or leaf.ndim == 0                 or leaf.size < min_size:
            return spec
        taken = set(i for i, ax in enumerate(spec) if ax is not None)
        for dim in range(leaf.ndim):
            if dim in taken:
                continue
            if leaf.shape[dim] % data_size == 0 and leaf.shape[dim] >= data_size:
                new = list(spec) + [None] * (leaf.ndim - len(spec))
                new[dim] = DATA_AXIS
                return P(*new)
        return spec

    return jax.tree_util.tree_map(
        upgrade, params, base, is_leaf=lambda x: isinstance(x, P))


def shard_params_fsdp(mesh: Mesh, params: Dict[str, Any],
                      min_size: int = 2 ** 16) -> Dict[str, Any]:
    specs = fsdp_param_specs(params, mesh, min_size=min_size)
    sh = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), specs,
        is_leaf=lambda x: isinstance(x, P))
    return jax.tree_util.tree_map(jax.device_put, params, sh)


def shard_opt_state_zero1(mesh: Mesh, opt_state) -> Any:
    """ZeRO-1-style optimizer-state sharding: every optimizer moment tensor is
    sharded over the DATA axis on its first divisible dimension (the reference
    has no optimizer sharding — SURVEY.md §2.5 lists it as the pjit freebie).
    GSPMD keeps the update math correct; XLA gathers/scatters as needed, so on
    an N-way data mesh the Adam moments cost 1/N HBM per chip. Like fsdp, the
    multi-slice 'dcn' axis is left replicated so the update-time gathers stay
    on intra-slice ICI."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, opt_leaf_zero1_sharding(mesh, x)), opt_state)


def opt_leaf_zero1_sharding(mesh: Mesh, x) -> NamedSharding:
    """The ZeRO-1 sharding for one optimizer-state leaf (shape/ndim only, so
    abstract ShapeDtypeStruct leaves work — the trainer's resume path derives
    the restore layout without allocating a template state)."""
    from oatx.parallel.mesh import DATA_AXIS

    data_size = mesh.shape[DATA_AXIS]
    if not hasattr(x, "ndim") or x.ndim == 0 or data_size <= 1:
        return NamedSharding(mesh, P())
    for dim in range(x.ndim):
        if x.shape[dim] % data_size == 0 and x.shape[dim] >= data_size:
            spec = [None] * x.ndim
            spec[dim] = DATA_AXIS
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def opt_state_template_shardings(params: Dict[str, Any], abstract_opt_state):
    """Shardings for every optimizer-state leaf WITHOUT materializing one on
    device (the trainer's resume path — an eager optimizer.init would
    transiently double the moment HBM at restore).

    optax moment trees (mu/nu/trace/…) mirror the params tree structure, so
    each opt-state leaf is matched to its param by the LONGEST path suffix
    that names a param leaf with the same shape, and inherits that param's
    sharding (what eager init's zeros_like would have produced). Unmatched
    leaves (e.g. the step count scalar) map to the string 'uncommitted' —
    a real leaf, unlike None, so tree_map structures still line up."""
    from jax.tree_util import keystr, tree_flatten_with_path

    def names(path) -> Tuple[str, ...]:
        return tuple(keystr((k,)).strip("[].'\"") for k in path)

    p_leaves, _ = tree_flatten_with_path(params)
    by_path = {names(path): leaf for path, leaf in p_leaves}

    def lookup(path, leaf):
        n = names(path)
        for start in range(len(n)):
            hit = by_path.get(n[start:])
            if hit is not None and getattr(hit, "shape", None) == leaf.shape:
                sh = getattr(hit, "sharding", None)
                if sh is not None:
                    return sh
        return "uncommitted"

    o_leaves, treedef = tree_flatten_with_path(abstract_opt_state)
    return jax.tree_util.tree_unflatten(
        treedef, [lookup(path, leaf) for path, leaf in o_leaves])


def shard_params_pipeline(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    """Pipeline-parallel placement: the video tower's depth-stacked blocks are
    sharded over the MODEL axis (stage s owns its block range — see
    parallel/pipeline.py); everything else is replicated. Mutually exclusive
    with the Megatron TP rules, which use the same axis for kernel shards."""
    from oatx.parallel.pipeline import stage_block_specs

    def specs(tree, path):
        if len(path) >= 2 and path[0] == "video" and path[1] == "blocks":
            # delegate to the single source of truth for stage specs — these
            # must match pipeline_blocks' shard_map in_specs exactly
            return stage_block_specs(tree)
        if isinstance(tree, dict):
            return {k: specs(v, path + (k,)) for k, v in tree.items()}
        return P()

    sp = specs(params, ())
    sh = jax.tree_util.tree_map(
        lambda s_: NamedSharding(mesh, s_), sp, is_leaf=lambda x: isinstance(x, P))
    return jax.tree_util.tree_map(jax.device_put, params, sh)
