"""GPipe pipeline parallelism (parallel/pipeline.py): exact equality with the
sequential block scan, forward and backward, on the 4x2 CPU mesh."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oatx.models import vit_spacetime as vst
from oatx.parallel import mesh as meshlib, pipeline as pp, sharding


@pytest.fixture(scope="module")
def setup():
    mesh = meshlib.make_mesh(8, model_parallel=2)  # data 4 x stages 2
    cfg = vst.SpaceTimeViTConfig(img_size=32, patch_size=16, embed_dim=64,
                                 depth=4, num_heads=4, num_frames=2,
                                 time_init="random")
    params = vst.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 9, 64)) * 0.1, jnp.float32)
    return mesh, cfg, params, x


def _seq(cfg, blocks, x):
    def body(h, bp):
        return vst._block_apply(cfg, bp, h, 2), None

    out, _ = jax.lax.scan(body, x, blocks)
    return out


def test_pipeline_blocks_matches_sequential(setup):
    mesh, cfg, params, x = setup
    block_fn = lambda bp, xx: vst._block_apply(cfg, bp, xx, 2)
    want = jax.jit(lambda b, xx: _seq(cfg, b, xx))(params["blocks"], x)
    for m in (2, 4):  # microbatch counts incl. bubble-heavy
        got = jax.jit(lambda b, xx, _m=m: pp.pipeline_blocks(
            mesh, block_fn, b, xx, 2, _m))(params["blocks"], x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pipeline_gradients_match_sequential(setup):
    mesh, cfg, params, x = setup
    block_fn = lambda bp, xx: vst._block_apply(cfg, bp, xx, 2)

    g_seq = jax.jit(jax.grad(
        lambda b, xx: jnp.sum(_seq(cfg, b, xx) ** 2)))(params["blocks"], x)
    g_pp = jax.jit(jax.grad(lambda b, xx: jnp.sum(
        pp.pipeline_blocks(mesh, block_fn, b, xx, 2, 2) ** 2)))(params["blocks"], x)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_full_tower_pipeline_mode_matches(setup):
    """vst.apply with pipeline_stages=2 equals the plain tower, through the
    whole forward (embed -> pipelined blocks -> final norm/pool)."""
    mesh, cfg, params, _ = setup
    cfg_pp = dataclasses.replace(cfg, pipeline_stages=2, pipeline_microbatches=2)
    params_pp = sharding.shard_params_pipeline(
        mesh, {"video": params})["video"]
    rng = np.random.default_rng(1)
    video = jnp.asarray(rng.standard_normal((16, 2, 32, 32, 3)), jnp.float32)
    video = jax.device_put(video, meshlib.batch_sharding(mesh))

    want = jax.jit(lambda p, v: vst.apply(p, cfg, v)["cls"])(params, video)
    got = jax.jit(lambda p, v: vst.apply(p, cfg_pp, v)["cls"])(params_pp, video)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_trainer_pipeline_mode_e2e(tmp_path):
    """Full Trainer run with trainer.pipeline on the 4x2 CPU mesh (stages on
    the model axis), incl. the padded eval path (runs sequentially)."""
    from oatx.config.schema import ExperimentCfg
    from oatx.data.factory import build_loaders
    from oatx.data.tokenizer import WordPieceTokenizer
    from oatx.train.trainer import Trainer

    exp = ExperimentCfg.from_dict({
        "name": "pp-e2e",
        "arch": {"variant": "baseline", "args": {
            "video_params": {"model": "SpaceTimeTransformer", "num_frames": 2,
                             "input_res": 32, "embed_dim": 32, "depth": 2,
                             "num_heads": 2, "pretrained": False},
            "text_params": {"model": "distilbert-base-uncased", "pretrained": False,
                            "vocab_size": 256, "dim": 32, "hidden_dim": 64,
                            "n_layers": 1, "n_heads": 2},
            "projection_dim": 8}},
        "data_loader": [{"type": "x", "args": {
            "dataset_name": "SyntheticVideoText",
            "data_dir": str(tmp_path / "v"), "object_dir": "",
            "batch_size": 8, "num_workers": 2, "split": "train",
            "video_params": {"input_res": 32, "num_frames": 2,
                             "num_videos": 16, "loading": "lax"}}}],
        "optimizer": {"type": "AdamW", "args": {"lr": 1e-3}},
        "loss": {"type": "NormSoftmaxLoss"},
        "metrics": ["t2v_metrics"],
        "trainer": {"epochs": 1, "save_dir": str(tmp_path / "e"),
                    "monitor": "off", "init_val": False, "precision": "f32",
                    "verbosity": 0, "seed": 0, "model_parallel": 2,
                    "pipeline": True, "pipeline_microbatches": 2},
    })
    tok = WordPieceTokenizer.build_from_corpus(
        [f"scene {i} dog" for i in range(40)], vocab_size=256)
    val = build_loaders(exp, tok, split="val")
    tr = Trainer(exp, build_loaders(exp, tok), val,
                 save_dir=None, log_dir=None)
    assert tr.tower_cfg.video.pipeline_stages == 2
    # blocks placed stage-sharded over the model axis
    spec = tr.state.params["video"]["blocks"]["mlp"]["fc1"]["kernel"].sharding.spec
    assert tuple(spec)[0] == "model", spec
    hist = tr.train()
    assert np.isfinite(hist[1]["loss_0"])
    # the padded eval path runs the SEQUENTIAL block apply over the
    # stage-sharded params (pipeline_stages=1 eval cfg); retrieval metrics
    # must come out structurally valid
    assert any(k.startswith("val_0_") for k in hist[1]), hist[1].keys()
