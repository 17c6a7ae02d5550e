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
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree on the mesh, batch-dim sharded."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
