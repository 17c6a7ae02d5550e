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
) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    mesh = Mesh(grid, (DATA_AXIS, MODEL_AXIS))
    set_current_mesh(mesh)
    return mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


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
