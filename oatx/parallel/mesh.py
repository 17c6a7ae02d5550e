"""Device mesh construction.

The framework trains single-program (pjit/GSPMD): one jitted train step over a 2-D
`(data, model)` mesh. Data parallelism (the reference's only strategy —
SURVEY.md §2.5) shards the batch over `data`; the `model` axis is available for
Megatron-style tensor parallelism of the MLP/attention kernels (see
oatx.parallel.sharding) and defaults to size 1 on small models. Replaces the
reference's NCCL process-group + DDP machinery (train_dist_multi.py:35-38,
base_trainer.py:23) — gradient reduction and the loss-time embedding all-gather fall
out of GSPMD sharding propagation over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
DCN_AXIS = "dcn"  # multi-slice pods: outer data-parallel axis crossing slices

# Process-wide current mesh: model code that wants to annotate ACTIVATION
# shardings (e.g. sequence parallelism) needs the mesh object for
# with_sharding_constraint; threading it through every pure forward signature
# would pollute the pytree API, so make_mesh registers it here. Semantics:
# holds the LAST mesh make_mesh created and is read at TRACE time — a process
# juggling several meshes must call make_mesh (or set_current_mesh) before
# tracing sequence-parallel models against a different mesh.
_CURRENT: Optional[Mesh] = None


def set_current_mesh(mesh: Optional[Mesh]) -> None:
    global _CURRENT
    _CURRENT = mesh


def current_mesh() -> Optional[Mesh]:
    return _CURRENT


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    dcn_slices: int = 1,
) -> Mesh:
    """Build the (data, model) mesh — or, with dcn_slices > 1, the multi-slice
    ('dcn', 'data', 'model') mesh for pods joined by data-center network.

    The multi-slice layout is the scaling-book recipe: pure data parallelism
    ACROSS slices (the 'dcn' axis carries only the per-step gradient reduce),
    while everything bandwidth-hungry — FSDP weight gathers, Megatron TP
    collectives, sequence-parallel activation shards — stays on the
    intra-slice ('data'/'model') axes and rides ICI. Batches shard over
    ('dcn', 'data') jointly (see batch_axes); parameter sharding rules never
    touch 'dcn' (oatx.parallel.sharding keeps it replicated by construction).
    On real multi-slice TPU, devices are grouped by their slice_index so each
    dcn row is one ICI domain; on flat device sets (single slice, CPU test
    meshes) the grouping degenerates to a plain reshape.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if dcn_slices < 1:
        raise ValueError(f"dcn_slices must be >= 1, got {dcn_slices}")
    if n % (model_parallel * dcn_slices) != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel} "
            f"x dcn_slices={dcn_slices}")
    if dcn_slices > 1:
        # group devices by ICI domain so the leading axis strides ACROSS
        # slices: slice k's devices fill grid[k]. getattr default covers
        # virtual CPU meshes (no slice_index) — there the sort is stable id
        # order and the reshape is the grouping.
        devs = sorted(devs, key=lambda d: (getattr(d, "slice_index", 0) or 0, d.id))
        grid = np.asarray(devs).reshape(
            dcn_slices, n // (dcn_slices * model_parallel), model_parallel)
        mesh = Mesh(grid, (DCN_AXIS, DATA_AXIS, MODEL_AXIS))
    else:
        grid = np.asarray(devs).reshape(n // model_parallel, model_parallel)
        mesh = Mesh(grid, (DATA_AXIS, MODEL_AXIS))
    set_current_mesh(mesh)
    return mesh


def batch_axes(mesh: Mesh) -> tuple:
    """Mesh axis names the batch dim shards over: ('dcn', 'data') on a
    multi-slice mesh, ('data',) otherwise."""
    return tuple(a for a in (DCN_AXIS, DATA_AXIS) if a in mesh.axis_names)


def batch_shards(mesh: Mesh) -> int:
    """Number of ways the batch dim is sharded (product of batch-axis sizes).
    Use this — not mesh.shape['data'] — for batch divisibility/padding logic;
    on a multi-slice mesh the batch also shards over 'dcn'."""
    out = 1
    for a in batch_axes(mesh):
        out *= mesh.shape[a]
    return out


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis (and the dcn axis on a
    multi-slice mesh)."""
    return NamedSharding(mesh, P(batch_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spans_processes(mesh: Mesh) -> bool:
    """True when the mesh covers devices of more than one JAX process (a real
    multi-host pod). Then each process holds only its LOCAL slice of the global
    batch (the loader shards by process_index — cli/train.py:48) and placement
    must assemble the global array from per-process data."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


def put_array(mesh: Mesh, x, sharding: Optional[NamedSharding] = None):
    """Place one host array on the mesh, batch-dim sharded over `data`.

    Single-host: a plain device_put of the (global) host batch. Multi-host: the
    host array is the process-LOCAL shard, so use
    jax.make_array_from_process_local_data — device_put of a local array to a
    global sharding would silently treat each host's shard as the whole global
    batch (reference semantics being replaced:
    MultiDistBaseDataLoaderExplicitSplit, base_data_loader.py:110-130, where
    each rank also loads only its split and NCCL sees the union)."""
    s = sharding if sharding is not None else batch_sharding(mesh)
    if spans_processes(mesh):
        return jax.make_array_from_process_local_data(s, np.asarray(x))
    return jax.device_put(x, s)


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree on the mesh, batch-dim sharded (multi-host
    aware — see put_array)."""
    return jax.tree_util.tree_map(lambda x: put_array(mesh, x), batch)
