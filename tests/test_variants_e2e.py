"""End-to-end object-aware variant runs (tiny models, CPU mesh)."""

import json
import os

import numpy as np
import pytest


def _cfg(tmp_path, variant, region_tap=1):
    return {
        "name": f"e2e-{variant}",
        "tokenizer": {"vocab_size": 256},
        "arch": {
            "type": "FrozenInTime", "variant": variant,
            "args": {
                "video_params": {
                    "model": "SpaceTimeTransformer", "arch_config": "base_patch16_224",
                    "num_frames": 2, "input_res": 32, "embed_dim": 32, "depth": 2,
                    "num_heads": 2, "time_init": "zeros", "pretrained": False,
                },
                "object_params": {"model": "", "input_objects": True},
                "text_params": {
                    "model": "distilbert-base-uncased", "pretrained": False,
                    "vocab_size": 256, "dim": 32, "hidden_dim": 64,
                    "n_layers": 1, "n_heads": 2,
                },
                "projection": "minimal", "projection_dim": 16,
                "load_checkpoint": "",
            },
        },
        "data_loader": [{
            "type": "MultiDistTextObjectVideoDataLoader",
            "args": {
                "dataset_name": "SyntheticVideoText",
                "data_dir": str(tmp_path / "videos"),
                "object_dir": str(tmp_path / "objects"),
                "batch_size": 8, "num_workers": 2, "split": "train",
                "object_params": {"num_mask_objects": 3, "top_k": 5},
                "video_params": {"input_res": 32, "num_frames": 2,
                                 "num_videos": 16, "loading": "lax"},
            },
        }],
        "optimizer": {"type": "AdamW", "args": {"lr": 1e-3}},
        "loss": {"type": "NormSoftmaxLoss", "args": {}},
        "metrics": ["t2v_metrics"],
        "trainer": {
            "epochs": 1, "max_samples_per_epoch": 16,
            "save_dir": str(tmp_path / "exps"), "save_period": 1,
            "verbosity": 0, "monitor": "off", "early_stop": 10,
            "init_val": False, "precision": "f32", "seed": 0,
        },
        "visualizer": {"type": ""},
    }


def _train(tmp_path, variant):
    from oatx.config.schema import ExperimentCfg, build_tower_config
    from oatx.data.factory import build_loaders
    from oatx.data.tokenizer import WordPieceTokenizer
    from oatx.train.trainer import Trainer
    import dataclasses
    import jax.numpy as jnp

    cfg = _cfg(tmp_path, variant)
    exp = ExperimentCfg.from_dict(cfg)
    tok = WordPieceTokenizer.build_from_corpus(
        [f"a dog runs in scene {i}" for i in range(20)], vocab_size=256)
    loaders = build_loaders(exp, tok)
    tr = Trainer(exp, loaders, [], save_dir=None, log_dir=None)
    if variant == "region_mem":
        # shrink the region tap for depth-2 tiny model
        video = dataclasses.replace(tr.tower_cfg.video, region_tap_layer=1)
        object.__setattr__(tr.tower_cfg, "video", video)
        from oatx.models import towers
        from oatx.train import step as steplib
        import jax

        params = towers.init(jax.random.PRNGKey(0), tr.tower_cfg)
        tr.state = steplib.init_state(jax.random.PRNGKey(0), tr.tower_cfg,
                                      tr.optimizer, params=params)
        tr.train_step = steplib.make_train_step(
            tr.tower_cfg, tr.loss_cfg, tr.optimizer, augment=tr.augment)
        tr.eval_step = steplib.make_eval_step(tr.tower_cfg)
    hist = tr.train()
    return tr, hist, exp, tok


def test_global_local_trains(tmp_path):
    tr, hist, _, _ = _train(tmp_path, "global_local")
    log = hist[1]
    assert np.isfinite(log["loss_0"])


def test_region_mem_trains_and_exports_maps(tmp_path):
    tr, hist, exp, tok = _train(tmp_path, "region_mem")
    assert np.isfinite(hist[1]["loss_0"])

    # binary-map export through the eval surface
    from oatx.data.factory import build_dataset, load_region_bank
    from oatx.data.loader import Collator, ShardedLoader
    from oatx.eval.retrieval_eval import export_region_maps

    ds = build_dataset(exp.data_loaders[0], "region_mem", "test",
                       load_region_bank(exp))
    loader = ShardedLoader(ds, batch_size=8, collate=Collator(tok),
                           shuffle=False, drop_last=True, num_workers=2)
    out = export_region_maps(tr.state.params, tr.tower_cfg, loader,
                             str(tmp_path / "maps"), limit=3)
    assert len(out) == 3 and all(os.path.exists(p) for p in out)


def test_eval_cli_global_local(tmp_path):
    """The test CLI over a global_local config must emit object_token_masks
    (tag-token-length wiring — a bare Collator crashed the jitted forward)."""
    import json as _json
    import subprocess
    import sys

    cfg = _cfg(tmp_path, "global_local")
    cfg["metrics"] = ["t2v_metrics"]
    p = tmp_path / "cfg.json"
    p.write_text(_json.dumps(cfg))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["OATX_PLATFORM"] = "cpu"  # in-code pin; JAX_PLATFORMS alone is overridden by the axon sitecustomize
    out = subprocess.run(
        [sys.executable, "-m", "oatx.cli.test", "-c", str(p), "--split", "train"],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=1800)
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    metrics = _json.loads(line)
    assert "t2v_metrics" in metrics
