"""Multi-slice ('dcn') mesh lane.

A pod of TPU slices joined by data-center network gets a 3-axis
('dcn', 'data', 'model') mesh (parallel/mesh.make_mesh dcn_slices>1): batches
shard over ('dcn', 'data') jointly, parameter sharding rules (TP, fsdp, zero1)
never touch 'dcn' — so FSDP weight gathers and TP collectives stay intra-slice
on ICI and the only cross-slice traffic is the gradient reduce (the
scaling-book multi-slice recipe). The reference has nothing comparable (DDP
only — SURVEY.md §2.5); these tests pin (a) the mesh/spec geometry and (b)
numerical identity of the training step across single-mesh and dcn-mesh
layouts — GSPMD annotations may never change semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from oatx.models import towers, distilbert as dbert, vit_spacetime as vst
from oatx.parallel import mesh as meshlib, sharding
from oatx.train import optim, step as steplib


@pytest.fixture(scope="module")
def tiny():
    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(img_size=32, patch_size=16, embed_dim=32,
                                     depth=2, num_heads=2, num_frames=2),
        text=dbert.DistilBertConfig(vocab_size=64, max_position_embeddings=16,
                                    dim=32, hidden_dim=64, n_layers=1, n_heads=2),
        projection_dim=8)
    params = towers.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = {
        "video": np.asarray(rng.standard_normal((8, 2, 32, 32, 3)), np.float32),
        "input_ids": np.asarray(rng.integers(0, 64, (8, 8))),
        "attention_mask": np.ones((8, 8), np.int32),
    }
    return cfg, params, batch


def _fresh(params):
    # copy: donated/placed arrays from one test must not invalidate the fixture
    return jax.tree_util.tree_map(np.asarray, params)


def test_mesh_axes_and_batch_helpers():
    mesh = meshlib.make_mesh(8, model_parallel=2, dcn_slices=2)
    assert mesh.axis_names == ("dcn", "data", "model")
    assert dict(mesh.shape) == {"dcn": 2, "data": 2, "model": 2}
    assert meshlib.batch_axes(mesh) == ("dcn", "data")
    assert meshlib.batch_shards(mesh) == 4
    assert meshlib.batch_sharding(mesh).spec == P(("dcn", "data"))

    flat = meshlib.make_mesh(8, model_parallel=2)
    assert flat.axis_names == ("data", "model")
    assert meshlib.batch_axes(flat) == ("data",)
    assert meshlib.batch_shards(flat) == 4
    assert meshlib.batch_sharding(flat).spec == P(("data",))

    with pytest.raises(ValueError):
        meshlib.make_mesh(8, model_parallel=2, dcn_slices=3)  # 8 % 6 != 0
    with pytest.raises(ValueError):
        meshlib.make_mesh(8, dcn_slices=0)


def test_param_specs_never_touch_dcn(tiny):
    """TP, fsdp and zero1 placements must leave the dcn axis replicated —
    cross-slice DCN may only carry the gradient reduce."""
    cfg, params, _ = tiny
    mesh = meshlib.make_mesh(8, model_parallel=2, dcn_slices=2)

    def axis_names_used(spec_tree):
        used = set()
        for spec in jax.tree_util.tree_leaves(
                spec_tree, is_leaf=lambda x: isinstance(x, P)):
            for entry in spec:
                for name in (entry if isinstance(entry, tuple) else (entry,)):
                    if name is not None:
                        used.add(name)
        return used

    assert "dcn" not in axis_names_used(sharding.param_specs(params, mesh))
    assert "dcn" not in axis_names_used(
        sharding.fsdp_param_specs(params, mesh, min_size=64))

    x = jnp.zeros((8, 4))
    zspec = sharding.opt_leaf_zero1_sharding(mesh, x).spec
    assert "dcn" not in axis_names_used([zspec])
    assert "data" in axis_names_used([zspec])  # still shards intra-slice


def test_dcn_step_matches_flat_mesh(tiny):
    """One full train step (fwd + NCE + bwd + AdamW) is numerically identical
    on (data=8), (dcn=2, data=4) and (dcn=2, data=2, model=2) meshes."""
    cfg, params, batch = tiny
    opt = optim.make_optimizer(lr=1e-3)
    losses, gnorms = [], []
    for kwargs in ({"model_parallel": 1},
                   {"model_parallel": 1, "dcn_slices": 2},
                   {"model_parallel": 2, "dcn_slices": 2}):
        mesh = meshlib.make_mesh(8, **kwargs)
        sp = sharding.shard_params(mesh, _fresh(params))
        state = steplib.init_state(jax.random.PRNGKey(1), cfg, opt, params=sp)
        step = steplib.make_train_step(cfg, steplib.LossConfig(), opt,
                                       donate=False)
        b = meshlib.shard_batch(mesh, batch)
        state, m = step(state, b)
        losses.append(float(m["loss"]))
        gnorms.append(float(m["grad_norm"]))
    assert losses[1] == pytest.approx(losses[0], rel=1e-5)
    assert losses[2] == pytest.approx(losses[0], rel=1e-5)
    assert gnorms[1] == pytest.approx(gnorms[0], rel=1e-4)
    assert gnorms[2] == pytest.approx(gnorms[0], rel=1e-4)


def test_dcn_fsdp_step_matches(tiny):
    """fsdp under a dcn mesh: params shard intra-slice only, step matches the
    replicated run."""
    cfg, params, batch = tiny
    opt = optim.make_optimizer(lr=1e-3)

    mesh = meshlib.make_mesh(8, model_parallel=1, dcn_slices=2)
    sp = sharding.shard_params_fsdp(mesh, _fresh(params), min_size=64)
    state = steplib.init_state(jax.random.PRNGKey(1), cfg, opt, params=sp)
    step = steplib.make_train_step(cfg, steplib.LossConfig(), opt, donate=False)
    _, m_fsdp = step(state, meshlib.shard_batch(mesh, batch))

    ref_loss, _ = steplib.loss_fn(_fresh(params), cfg, steplib.LossConfig(),
                                  jax.tree_util.tree_map(jnp.asarray, batch))
    assert float(m_fsdp["loss"]) == pytest.approx(float(ref_loss), rel=1e-5)


def test_dcn_fwd_chunk_global_negatives(tiny):
    """fwd_chunk's shard_map must name BOTH batch axes (('dcn','data')) —
    an unmentioned dcn axis would be silently replicated and each slice would
    see the wrong batch shard. Loss must equal the plain full-batch step."""
    cfg, params, batch = tiny
    opt = optim.make_optimizer(lr=0.0, weight_decay=0.0)

    mesh = meshlib.make_mesh(8, model_parallel=1, dcn_slices=2)
    sp = sharding.shard_params(mesh, _fresh(params))
    state = steplib.init_state(jax.random.PRNGKey(1), cfg, opt, params=sp)
    step = steplib.make_train_step(cfg, steplib.LossConfig(), opt, donate=False,
                                   fwd_chunk=1, mesh=mesh)
    _, m = step(state, meshlib.shard_batch(mesh, batch))

    ref_loss, _ = steplib.loss_fn(_fresh(params), cfg, steplib.LossConfig(),
                                  jax.tree_util.tree_map(jnp.asarray, batch))
    assert float(m["loss"]) == pytest.approx(float(ref_loss), rel=1e-5)


def test_dcn_pipeline_matches_sequential(tiny):
    """GPipe stages on the intra-slice model axis under a dcn mesh: the
    microbatch spec names ('dcn','data') so each slice processes its own
    shard; numerics equal the sequential (stages=1) forward."""
    import dataclasses as dc

    cfg, params, batch = tiny
    opt = optim.make_optimizer(lr=0.0, weight_decay=0.0)
    mesh = meshlib.make_mesh(8, model_parallel=2, dcn_slices=2)

    pp_cfg = dc.replace(cfg, video=dc.replace(
        cfg.video, pipeline_stages=2, pipeline_microbatches=2))
    sp = sharding.shard_params_pipeline(mesh, _fresh(params))
    state = steplib.init_state(jax.random.PRNGKey(1), cfg, opt, params=sp)
    step = steplib.make_train_step(pp_cfg, steplib.LossConfig(), opt,
                                   donate=False)
    _, m = step(state, meshlib.shard_batch(mesh, batch))

    ref_loss, _ = steplib.loss_fn(_fresh(params), cfg, steplib.LossConfig(),
                                  jax.tree_util.tree_map(jnp.asarray, batch))
    assert float(m["loss"]) == pytest.approx(float(ref_loss), rel=1e-5)


def test_trainer_config_accepts_dcn_slices():
    from oatx.config.schema import TrainerCfg

    assert TrainerCfg(dcn_slices=2).dcn_slices == 2
    assert TrainerCfg().dcn_slices == 1
