"""End-to-end trainer/eval tests on the 8-device CPU mesh (tiny model)."""

import json
import os

import numpy as np
import pytest


def _smoke_config(tmp_path, **overrides):
    cfg = {
        "name": "e2e",
        "tokenizer": {"vocab_size": 256},
        "arch": {
            "type": "FrozenInTime",
            "variant": "baseline",
            "args": {
                "video_params": {
                    "model": "SpaceTimeTransformer", "arch_config": "base_patch16_224",
                    "num_frames": 2, "input_res": 32, "embed_dim": 32, "depth": 1,
                    "num_heads": 2, "time_init": "zeros", "pretrained": False,
                },
                "object_params": {"model": ""},
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
            "type": "TextVideoDataLoader",
            "args": {
                "dataset_name": "SyntheticVideoText",
                "data_dir": str(tmp_path / "videos"),
                "object_dir": str(tmp_path / "objects"),
                "batch_size": 8, "num_workers": 4, "split": "train",
                "video_params": {"input_res": 32, "num_frames": 2,
                                 "num_videos": 16, "loading": "lax"},
            },
        }],
        "optimizer": {"type": "AdamW", "args": {"lr": 1e-3}},
        "loss": {"type": "NormSoftmaxLoss", "args": {}},
        "metrics": ["t2v_metrics", "v2t_metrics"],
        "trainer": {
            "epochs": 2, "max_samples_per_epoch": 16,
            "save_dir": str(tmp_path / "exps"), "save_period": 1,
            "verbosity": 0, "monitor": "min val_loss_0", "early_stop": 10,
            "init_val": False, "precision": "f32", "seed": 0,
        },
        "visualizer": {"type": ""},
    }
    cfg.update(overrides)
    return cfg


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Train 2 tiny epochs through the real CLI main(); reused by several tests."""
    from oatx.cli.train import main

    tmp_path = tmp_path_factory.mktemp("e2e")
    cfg = _smoke_config(tmp_path)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    rc = main(["-c", str(cfg_path), "--no_timestamp"])
    assert rc == 0
    save_dir = tmp_path / "exps" / "models" / "e2e"
    return tmp_path, cfg, save_dir


def test_training_produces_checkpoints(trained):
    _, _, save_dir = trained
    assert (save_dir / "checkpoint-epoch1").exists()
    assert (save_dir / "checkpoint-epoch2").exists()
    assert (save_dir / "model_best").exists()
    assert (save_dir / "config.json").exists()
    meta = json.loads((save_dir / "model_best.meta.json").read_text())
    assert np.isfinite(meta["monitor_best"])


def test_training_loss_decreases(trained):
    """A few epochs over 16 fixed clips must reduce the contrastive loss
    (first-epoch mean includes the fresh-init step, so compare last vs first)."""
    tmp_path, cfg, save_dir = trained
    from oatx.config.schema import ExperimentCfg
    from oatx.data.factory import build_loaders
    from oatx.data.tokenizer import WordPieceTokenizer
    from oatx.train.trainer import Trainer

    cfg = dict(cfg)
    cfg["trainer"] = {**cfg["trainer"], "epochs": 4}
    exp = ExperimentCfg.from_dict(cfg)
    tok = WordPieceTokenizer.build_from_corpus(
        [f"a dog runs in scene {i}" for i in range(20)], vocab_size=256)
    loaders = build_loaders(exp, tok)
    tr = Trainer(exp, loaders, [], save_dir=None, log_dir=None)
    hist = tr.train()
    assert hist[4]["loss_0"] < hist[1]["loss_0"]
    # live input-stall diagnostic: fraction of epoch wall time blocked on the
    # host data plane (decode+collate+H2D not hidden by the prefetch overlap)
    for ep in hist.values():
        assert 0.0 <= ep["input_wait"] <= 1.0


def test_resume_continues(trained):
    tmp_path, cfg, save_dir = trained
    from oatx.cli.train import main

    rc = main(["-r", str(save_dir / "checkpoint-epoch1"), "--no_timestamp"])
    assert rc == 0


def test_eval_cli(trained):
    tmp_path, cfg, save_dir = trained
    from oatx.cli.test import main

    rc = main(["-r", str(save_dir / "model_best"), "--split", "test"])
    assert rc == 0


def test_eval_cli_sliding_window(trained, capsys):
    tmp_path, cfg, save_dir = trained
    from oatx.cli.test import main

    rc = main(["-r", str(save_dir / "model_best"), "--split", "test",
               "--sliding_window_stride", "8"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(out)
    assert "t2v_metrics" in metrics and "R1" in metrics["t2v_metrics"]


def test_linear_probe_freezes_towers(trained):
    """--linear_eval must leave tower params untouched and move projections."""
    tmp_path, cfg, save_dir = trained
    from oatx.config.schema import ExperimentCfg
    from oatx.data.factory import build_loaders
    from oatx.data.tokenizer import WordPieceTokenizer
    from oatx.train.trainer import Trainer
    import jax

    exp = ExperimentCfg.from_dict({**cfg, "trainer": {**cfg["trainer"], "epochs": 1}})
    tok = WordPieceTokenizer.build_from_corpus(["a dog"], vocab_size=256)
    loaders = build_loaders(exp, tok)
    tr = Trainer(exp, loaders, [], save_dir=None, log_dir=None, linear_eval=True)
    before = jax.tree_util.tree_map(np.asarray, tr.state.params)
    tr.train()
    after = jax.tree_util.tree_map(np.asarray, tr.state.params)
    np.testing.assert_allclose(after["video"]["cls_token"], before["video"]["cls_token"])
    np.testing.assert_allclose(
        after["text"]["embeddings"]["word"], before["text"]["embeddings"]["word"])
    assert not np.allclose(after["vid_proj"]["kernel"], before["vid_proj"]["kernel"])
    assert not np.allclose(after["txt_proj"]["kernel"], before["txt_proj"]["kernel"])


def test_len_epoch_iteration_based(tmp_path):
    """trainer.len_epoch runs exactly N cycles/epoch with endless loader
    cycling (reference len_epoch + inf_loop, trainer_dist.py:72-79): 16 videos
    at bs=8 is 2 batches/pass, len_epoch=5 must still complete 5 train steps
    (asserted via the optimizer step counter — log capture is handler-bound
    and flaky across the suite)."""
    from oatx.config.schema import ExperimentCfg
    from oatx.data.factory import build_loaders
    from oatx.data.tokenizer import WordPieceTokenizer
    from oatx.train.trainer import Trainer

    cfg = _smoke_config(tmp_path)
    cfg["trainer"]["epochs"] = 1
    cfg["trainer"]["len_epoch"] = 5
    exp = ExperimentCfg.from_dict(cfg)
    tok = WordPieceTokenizer.build_from_corpus(
        [f"clip {i}" for i in range(30)], vocab_size=256)
    loaders = build_loaders(exp, tok)
    trainer = Trainer(exp, loaders, save_dir=tmp_path / "exps", log_dir=tmp_path)
    assert trainer.cycles_per_epoch == 5
    trainer.train()
    assert int(trainer.state.step) == 5  # 5 cycles x 1 loader, loader wrapped past 2


def test_validation_skips_mask_requiring_metrics(tmp_path):
    """Configured metrics that need a label matrix (mAP,
    retrieval_as_classification) are warned-and-skipped during validation
    instead of crashing the first epoch (they have no sims-only form)."""
    from oatx.config.schema import ExperimentCfg
    from oatx.data.factory import build_loaders
    from oatx.data.tokenizer import WordPieceTokenizer
    from oatx.train.trainer import Trainer

    cfg = _smoke_config(
        tmp_path,
        metrics=["t2v_metrics", "mean_average_precision",
                 "retrieval_as_classification"])
    cfg["trainer"]["epochs"] = 1
    exp = ExperimentCfg.from_dict(cfg)
    tok = WordPieceTokenizer.build_from_corpus(
        [f"a dog runs in scene {i}" for i in range(20)], vocab_size=256)
    val = build_loaders(exp, tok, split="val")
    tr = Trainer(exp, build_loaders(exp, tok), val, save_dir=None, log_dir=None)
    hist = tr.train()
    log = hist[1]
    assert any(k.startswith("val_0_t2v_") for k in log)
    assert not any("mAP" in k or "mean_average" in k for k in log)


def test_clip_text_family_cli_train(tmp_path):
    """Full CLI training with the first-party CLIP text tower: tokenizer
    resolution (synthetic BPE fallback), clip_bpe.txt.gz persisted next to the
    checkpoints, loss finite, and eval CLI runs against the checkpoint."""
    import os as _os

    from oatx.cli.train import main

    env_bpe = _os.environ.pop("OATX_CLIP_BPE", None)
    try:
        cfg = _smoke_config(tmp_path)
        cfg["name"] = "e2e-clip"
        cfg["arch"]["args"]["text_params"] = {
            "model": "clip", "pretrained": False, "vocab_size": 1024,
            "dim": 32, "n_layers": 1, "n_heads": 2}
        cfg["trainer"]["epochs"] = 1
        cfg_path = tmp_path / "cfg.json"
        cfg_path.write_text(json.dumps(cfg))
        rc = main(["-c", str(cfg_path), "--no_timestamp"])
        assert rc == 0
        save_dir = tmp_path / "exps" / "models" / "e2e-clip"
        assert (save_dir / "clip_bpe.txt.gz").exists()
        assert (save_dir / "checkpoint-epoch1").exists()

        from oatx.cli.test import main as eval_main

        rc = eval_main(["-r", str(save_dir / "checkpoint-epoch1"),
                        "--split", "train"])
        assert rc == 0
    finally:
        if env_bpe is not None:
            _os.environ["OATX_CLIP_BPE"] = env_bpe


def test_fwd_chunk_multichip_trainer_e2e(tmp_path):
    """trainer.fwd_chunk on the 8-wide data mesh takes the shard_map path
    (per-chip remat-scan, global-batch negatives) through the real CLI."""
    from oatx.cli.train import main

    cfg = _smoke_config(tmp_path)
    cfg["trainer"] = {**cfg["trainer"], "epochs": 1, "fwd_chunk": 1}
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    rc = main(["-c", str(cfg_path), "--no_timestamp"])
    assert rc == 0
    save_dir = tmp_path / "exps" / "models" / "e2e"
    meta = json.loads((save_dir / "model_best.meta.json").read_text())
    assert np.isfinite(meta["monitor_best"])


def test_in_run_profiler_capture(tmp_path):
    """trainer.profile_epoch captures a jax.profiler device trace inside the
    real training loop (in-run counterpart of tools/exp_step_trace.py): with
    profile_start_step=1/profile_steps=1 on a 2-step epoch the trace must land
    in <log_dir>/profile and be summarizable, and the capture must run once."""
    from oatx.config.schema import ExperimentCfg
    from oatx.data.factory import build_loaders
    from oatx.data.tokenizer import WordPieceTokenizer
    from oatx.train.trainer import Trainer
    from oatx.utils.profiler import summarize_trace

    cfg = _smoke_config(tmp_path)
    cfg["trainer"].update(epochs=2, profile_epoch=1,
                          profile_start_step=1, profile_steps=1)
    exp = ExperimentCfg.from_dict(cfg)
    tok = WordPieceTokenizer.build_from_corpus(
        [f"clip {i}" for i in range(30)], vocab_size=256)
    tr = Trainer(exp, build_loaders(exp, tok),
                 save_dir=None, log_dir=tmp_path / "log")
    tr.train()
    assert tr._profile_done and not tr._profiling
    traces = list((tmp_path / "log" / "profile").glob(
        "plugins/profile/*/*.trace.json.gz"))
    assert traces, "no trace file captured under log_dir/profile"
    rows = summarize_trace(str(tmp_path / "log" / "profile"), top=3)
    assert rows and all(r["total_ms"] >= 0 for r in rows)


def test_val_period_amortizes_validation(trained, tmp_path):
    """trainer.val_period=3: only epochs 3k (and the final epoch) validate;
    others train without paying the eval pass."""
    _, cfg, _ = trained
    from oatx.config.schema import ExperimentCfg
    from oatx.data.factory import build_loaders
    from oatx.data.tokenizer import WordPieceTokenizer
    from oatx.train.trainer import Trainer

    cfg = dict(cfg)
    cfg["trainer"] = {**cfg["trainer"], "epochs": 4, "init_val": False,
                      "val_period": 3}
    exp = ExperimentCfg.from_dict(cfg)
    tok = WordPieceTokenizer.build_from_corpus(
        [f"a dog runs in scene {i}" for i in range(20)], vocab_size=256)
    train_loaders = build_loaders(exp, tok, split="train")
    val_loaders = build_loaders(exp, tok, split="val")
    tr = Trainer(exp, train_loaders, val_loaders, save_dir=None, log_dir=None)
    hist = tr.train()
    validated = {e for e, log in hist.items() if "val_loss_0" in log}
    # epoch 3 (period) and epoch 4 (final) — never 1 or 2
    assert validated == {3, 4}, validated
