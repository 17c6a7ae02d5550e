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


def test_sequence_parallel_is_numerically_identical():
    """sequence_parallel shards the activation token axis over the model axis
    (vit_spacetime._sp_constrain); outputs and gradients must equal the
    unsharded run — GSPMD annotations may never change semantics. T = 9 here,
    so the 2-way model shard is deliberately uneven."""
    import dataclasses

    import jax
    from oatx.models import vit_spacetime as vst

    mesh = meshlib.make_mesh(8, model_parallel=2)  # registers current mesh
    cfg = vst.SpaceTimeViTConfig(img_size=32, patch_size=16, embed_dim=64,
                                 depth=2, num_heads=4, num_frames=2,
                                 time_init="random")
    cfg_sp = dataclasses.replace(cfg, sequence_parallel=True)
    params = sharding.shard_params(mesh, vst.init(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.standard_normal((8, 2, 32, 32, 3)), jnp.float32)
    video = jax.device_put(video, meshlib.batch_sharding(mesh))

    out = jax.jit(lambda p, v: vst.apply(p, cfg, v)["cls"])(params, video)
    out_sp = jax.jit(lambda p, v: vst.apply(p, cfg_sp, v)["cls"])(params, video)
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out),
                               atol=1e-5, rtol=1e-5)

    g = jax.jit(jax.grad(lambda p, v: jnp.sum(vst.apply(p, cfg, v)["cls"] ** 2)))(
        params, video)
    g_sp = jax.jit(jax.grad(lambda p, v: jnp.sum(vst.apply(p, cfg_sp, v)["cls"] ** 2)))(
        params, video)
    for a, b in zip(jax.tree_util.tree_leaves(g_sp), jax.tree_util.tree_leaves(g)):
        # gradients sum over resharded partials — f32 reduction-order noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


def test_fsdp_sharding_is_numerically_identical():
    """FSDP-style param sharding (data-axis dim on every sizeable leaf) must
    not change forward results — GSPMD all-gathers at use."""
    import jax
    from oatx.models import vit_spacetime as vst

    mesh = meshlib.make_mesh(8, model_parallel=2)
    cfg = vst.SpaceTimeViTConfig(img_size=32, patch_size=16, embed_dim=64,
                                 depth=2, num_heads=4, num_frames=2,
                                 time_init="random")
    raw = vst.init(jax.random.PRNGKey(3), cfg)
    p_rep = sharding.shard_params(mesh, raw)
    p_fsdp = sharding.shard_params_fsdp(mesh, raw, min_size=1024)
    # at least the MLP kernels must actually be data-sharded
    spec = p_fsdp["blocks"]["mlp"]["fc1"]["kernel"].sharding.spec
    assert "data" in tuple(spec), spec

    rng = np.random.default_rng(0)
    video = jax.device_put(
        jnp.asarray(rng.standard_normal((8, 2, 32, 32, 3)), jnp.float32),
        meshlib.batch_sharding(mesh))
    a = jax.jit(lambda p, v: vst.apply(p, cfg, v)["cls"])(p_rep, video)
    b = jax.jit(lambda p, v: vst.apply(p, cfg, v)["cls"])(p_fsdp, video)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("arch_config,dims", [
    ("large_patch16_224", (1024, 24, 16, 16)),
    ("huge_patch14_224", (1280, 32, 16, 14)),
])
def test_large_arch_table_entries(arch_config, dims):
    """ViT-L/16 and ViT-H/14 geometry names resolve through the config system
    (oatx extension — the reference ships ViT-B only)."""
    from oatx.config.schema import ArchCfg, build_tower_config

    d, depth, heads, patch = dims
    arch = ArchCfg.from_dict({
        "type": "FrozenInTime", "variant": "baseline",
        "args": {
            "video_params": {"model": "SpaceTimeTransformer",
                             "arch_config": arch_config,
                             "num_frames": 2, "pretrained": False},
            "text_params": {"model": "distilbert-base-uncased",
                            "pretrained": False},
            "projection": "minimal", "projection_dim": 256,
        },
    })
    cfg = build_tower_config(arch)
    assert (cfg.video.embed_dim, cfg.video.depth,
            cfg.video.num_heads, cfg.video.patch_size) == (d, depth, heads, patch)
    assert cfg.video.img_size % cfg.video.patch_size == 0


def test_vit_large_geometry_sharded_step():
    """Trimmed-depth ViT-L tensor geometry (dim 1024, 16 heads, patch 16) runs
    fwd+grad under TP=2 on the mesh — catches head/dim divisibility and layout
    issues the dim-64 toy tests cannot (16 heads / model=2 → 8 heads Dh=64 per
    shard)."""
    import jax
    from oatx.models import vit_spacetime as vst

    mesh = meshlib.make_mesh(8, model_parallel=2)
    cfg = vst.SpaceTimeViTConfig(img_size=112, patch_size=16, embed_dim=1024,
                                 depth=2, num_heads=16, num_frames=2,
                                 time_init="zeros")
    params = sharding.shard_params(mesh, vst.init(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    video = jax.device_put(
        jnp.asarray(rng.standard_normal((8, 2, 112, 112, 3)), jnp.float32),
        meshlib.batch_sharding(mesh))
    g = jax.jit(jax.grad(lambda p, v: jnp.sum(vst.apply(p, cfg, v)["cls"] ** 2)))(
        params, video)
    leaf = g["blocks"]["mlp"]["fc1"]["kernel"]
    assert leaf.shape[-1] == 4096 and np.isfinite(np.asarray(leaf).sum())
