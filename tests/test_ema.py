"""Parameter EMA (optim.ema_of_params) + checkpoint averaging: transform math
vs a manual oracle, state extraction, end-to-end CLI training with
trainer.ema_decay, --ema eval loading, and tools/average_checkpoints.py."""

import json

import numpy as np
import pytest

from tests.test_trainer_e2e import _smoke_config


def _leaf(tree, *path):
    for k in path:
        tree = tree[k]
    return np.asarray(tree)


def test_ema_transform_matches_manual_oracle():
    import jax.numpy as jnp
    import optax

    from oatx.train import optim

    decay = 0.9
    tx = optim.make_optimizer(lr=0.1, weight_decay=0.0, ema_decay=decay)
    params = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    state = tx.init(params)
    ema_manual = {k: np.asarray(v) for k, v in params.items()}
    for step in range(3):
        grads = {"w": jnp.full((3,), 0.5 * (step + 1)),
                 "b": jnp.full((2,), -1.0)}
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        for k in ema_manual:
            ema_manual[k] = ema_manual[k] * decay + np.asarray(params[k]) * (1 - decay)
    ema = optim.find_ema(state)
    assert ema is not None
    for k in ema_manual:
        np.testing.assert_allclose(np.asarray(ema[k]), ema_manual[k],
                                   rtol=1e-6, atol=1e-7)


def test_find_ema_absent_and_nested():
    import jax.numpy as jnp

    from oatx.train import optim

    params = {"w": jnp.ones((2,))}
    plain = optim.make_optimizer(lr=0.1)
    assert optim.find_ema(plain.init(params)) is None
    # grad_clip + freeze + ema: the EMA sits at the end of a nested chain
    full = optim.make_optimizer(lr=0.1, grad_clip=1.0,
                                trainable_filter=lambda p: True,
                                ema_decay=0.99)
    ema = optim.find_ema(full.init(params))
    assert ema is not None
    np.testing.assert_array_equal(np.asarray(ema["w"]), np.ones((2,)))


def test_ema_decay_validation():
    from oatx.train import optim

    with pytest.raises(ValueError, match="ema_decay"):
        optim.ema_of_params(1.0)
    with pytest.raises(ValueError, match="ema_decay"):
        optim.ema_of_params(0.0)


@pytest.fixture(scope="module")
def ema_trained(tmp_path_factory):
    """2 tiny CLI epochs with trainer.ema_decay enabled."""
    from oatx.cli.train import main

    tmp_path = tmp_path_factory.mktemp("ema_e2e")
    cfg = _smoke_config(tmp_path)
    cfg["trainer"]["ema_decay"] = 0.9
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main(["-c", str(cfg_path), "--no_timestamp"]) == 0
    return tmp_path, cfg, tmp_path / "exps" / "models" / "e2e"


def test_ema_checkpoint_carries_and_loads_ema(ema_trained):
    """The snapshot's opt_state carries EMA params; import_initial_weights
    prefer_ema loads them and they differ from raw params (the model moved)."""
    import jax.numpy as jnp

    from oatx.config.schema import ExperimentCfg, build_tower_config
    from oatx.train import checkpoint as ckptlib

    tmp_path, cfg, save_dir = ema_trained
    tower_cfg = build_tower_config(ExperimentCfg.from_dict(cfg).arch,
                                   compute_dtype=jnp.float32)
    ckpt = str(save_dir / "model_best")
    raw = ckptlib.import_initial_weights(ckpt, tower_cfg, None)
    ema = ckptlib.import_initial_weights(ckpt, tower_cfg, None, prefer_ema=True)
    w_raw = _leaf(raw, "vid_proj", "kernel")
    w_ema = _leaf(ema, "vid_proj", "kernel")
    assert w_raw.shape == w_ema.shape
    assert not np.allclose(w_raw, w_ema)  # EMA lags the live params
    # EMA must be a plausible average: within the span the raw weights moved
    assert np.all(np.isfinite(w_ema))


def test_ema_eval_cli_flag(ema_trained, capsys):
    from oatx.cli.test import main

    tmp_path, _, save_dir = ema_trained
    rc = main(["-c", str(tmp_path / "cfg.json"), "-r", str(save_dir / "model_best"),
               "--split", "train", "--ema", "--no_timestamp",
               "--save_dir", str(tmp_path / "eval_ema")])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(out)
    assert "t2v_metrics" in metrics and np.isfinite(metrics["t2v_metrics"]["R1"])


def test_ema_prefer_falls_back_without_ema(tmp_path):
    """--ema on a snapshot trained WITHOUT ema_decay warns and uses raw."""
    import jax
    import jax.numpy as jnp

    from oatx.models import distilbert as dbert, towers, vit_spacetime as vst
    from oatx.train import checkpoint as ckptlib, optim, step as steplib

    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(img_size=32, patch_size=16, embed_dim=32,
                                     depth=1, num_heads=2, num_frames=2),
        text=dbert.DistilBertConfig(vocab_size=64, max_position_embeddings=16,
                                    dim=32, hidden_dim=64, n_layers=1, n_heads=2),
        projection_dim=8, compute_dtype=jnp.float32)
    state = steplib.init_state(jax.random.PRNGKey(0), cfg,
                               optim.make_optimizer(lr=1e-3))
    ckptlib.save_checkpoint(tmp_path, "snap", state, 1, 0.0)
    out = ckptlib.import_initial_weights(str(tmp_path / "snap"), cfg, None,
                                         prefer_ema=True)
    np.testing.assert_array_equal(_leaf(out, "vid_proj", "kernel"),
                                  _leaf(state.params, "vid_proj", "kernel"))


def test_average_checkpoints_tool(ema_trained, tmp_path):
    """tools/average_checkpoints.py: the soup equals the per-leaf mean and
    loads through import_initial_weights; --ema averages the EMA subtrees."""
    import jax.numpy as jnp

    from oatx.config.schema import ExperimentCfg, build_tower_config
    from oatx.train import checkpoint as ckptlib
    from tools.average_checkpoints import main

    _, cfg, save_dir = ema_trained
    tower_cfg = build_tower_config(ExperimentCfg.from_dict(cfg).arch,
                                   compute_dtype=jnp.float32)
    c1, c2 = str(save_dir / "checkpoint-epoch1"), str(save_dir / "checkpoint-epoch2")
    out = str(tmp_path / "soup")
    assert main([c1, c2, "--out", out]) == 0
    soup = ckptlib.import_initial_weights(out, tower_cfg, None)
    p1 = ckptlib.import_initial_weights(c1, tower_cfg, None)
    p2 = ckptlib.import_initial_weights(c2, tower_cfg, None)
    np.testing.assert_allclose(
        _leaf(soup, "vid_proj", "kernel"),
        (_leaf(p1, "vid_proj", "kernel") + _leaf(p2, "vid_proj", "kernel")) / 2,
        rtol=1e-6, atol=1e-7)

    out_ema = str(tmp_path / "soup_ema")
    assert main([c1, c2, "--out", out_ema, "--ema"]) == 0
    soup_ema = ckptlib.import_initial_weights(out_ema, tower_cfg, None)
    e1 = ckptlib.import_initial_weights(c1, tower_cfg, None, prefer_ema=True)
    e2 = ckptlib.import_initial_weights(c2, tower_cfg, None, prefer_ema=True)
    np.testing.assert_allclose(
        _leaf(soup_ema, "vid_proj", "kernel"),
        (_leaf(e1, "vid_proj", "kernel") + _leaf(e2, "vid_proj", "kernel")) / 2,
        rtol=1e-6, atol=1e-7)
