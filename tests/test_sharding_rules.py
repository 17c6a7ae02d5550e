import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from oatx.parallel import mesh as meshlib
from oatx.parallel import sharding


def test_megatron_specs():
    params = {
        "blocks": {
            "mlp": {"fc1": {"kernel": jnp.zeros((2, 8, 32))},
                    "fc2": {"kernel": jnp.zeros((2, 32, 8))}},
            "attn": {"qkv": {"kernel": jnp.zeros((2, 8, 24))},
                     "proj": {"kernel": jnp.zeros((2, 8, 8))}},
            "norm1": {"scale": jnp.zeros((2, 8))},
        },
        "embeddings": {"word": jnp.zeros((64, 8))},
        "vid_proj": {"kernel": jnp.zeros((8, 4))},
    }
    specs = sharding.param_specs(params)
    assert specs["blocks"]["mlp"]["fc1"]["kernel"] == P(None, None, "model")
    assert specs["blocks"]["mlp"]["fc2"]["kernel"] == P(None, "model", None)
    assert specs["blocks"]["attn"]["qkv"]["kernel"] == P(None, None, "model")
    assert specs["blocks"]["attn"]["proj"]["kernel"] == P(None, "model", None)
    assert specs["blocks"]["norm1"]["scale"] == P()
    assert specs["embeddings"]["word"] == P("model", None)
    assert specs["vid_proj"]["kernel"] == P()  # projection heads replicated


def test_indivisible_dims_fall_back_to_replication():
    mesh = meshlib.make_mesh(8, model_parallel=2)
    params = {
        "embeddings": {"word": jnp.zeros((30523, 8))},  # odd vocab: not divisible
        "mlp": {"fc1": {"kernel": jnp.zeros((8, 32))}},
    }
    specs = sharding.param_specs(params, mesh)
    assert specs["embeddings"]["word"] == P()          # fell back
    assert specs["mlp"]["fc1"]["kernel"] == P(None, "model")
    # device_put must succeed for everything
    sharded = sharding.shard_params(mesh, params)
    assert sharded["embeddings"]["word"].shape == (30523, 8)


def test_shard_params_roundtrip():
    mesh = meshlib.make_mesh(8, model_parallel=2)
    params = {"mlp": {"fc1": {"kernel": jnp.arange(64, dtype=jnp.float32).reshape(8, 8)}}}
    sharded = sharding.shard_params(mesh, params)
    np.testing.assert_array_equal(np.asarray(sharded["mlp"]["fc1"]["kernel"]),
                                  np.arange(64).reshape(8, 8))
