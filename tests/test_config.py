import json
import os

import pytest

from oatx.config.parser import load_experiment
from oatx.config.registry import METRICS, Registry
from oatx.config.schema import ExperimentCfg, build_tower_config

REF_CONFIG = "/root/reference/OATrans/configs/pt/cc3m_webvid/norm.json"


def test_own_configs_parse():
    import glob

    paths = sorted(glob.glob("/root/repo/configs/**/*.json", recursive=True))
    assert len(paths) >= 8  # every shipped config must stay parseable
    for p in paths:
        cfg = ExperimentCfg.from_json(p)
        assert cfg.arch.type == "FrozenInTime", p
        assert len(cfg.data_loaders) >= 1, p
        build_tower_config(cfg.arch)
    # reference experiments keep the reference's projection width
    cfg = ExperimentCfg.from_json("/root/repo/configs/pt/cc3m_webvid/norm.json")
    assert build_tower_config(cfg.arch).projection_dim == 256
    # the ViT-H pod recipe carries its measured remat policy through to the
    # model config (PERF.md "ViT-H/14 executed on the real chip")
    cfg = ExperimentCfg.from_json("/root/repo/configs/pt/cc3m_webvid/vit_huge_pod.json")
    tc = build_tower_config(cfg.arch)
    assert tc.video.remat is True
    assert tc.video.remat_policy == "dots_all"
    assert tc.video.embed_dim == 1280 and tc.video.depth == 32


@pytest.mark.skipif(not os.path.exists(REF_CONFIG), reason="reference unavailable")
def test_reference_config_parses_unchanged():
    """The reference's own JSON files must load without modification."""
    cfg = ExperimentCfg.from_json(REF_CONFIG)
    assert cfg.name == "full-cc-WebVid2M-1f-pti2k-normal"
    assert cfg.n_gpu == 8
    assert len(cfg.data_loaders) == 2
    assert cfg.data_loaders[0].dataset_name == "ConceptualCaptions3M"
    assert cfg.data_loaders[0].num_frames == 1
    assert cfg.data_loaders[1].dataset_name == "WebVid"
    assert cfg.data_loaders[1].num_frames == 4
    assert cfg.data_loaders[1].cut == "2M"
    assert cfg.data_loaders[1].loading == "lax"
    assert cfg.optimizer.lr == 2e-4
    assert cfg.loss.type == "NormSoftmaxLoss"
    assert cfg.trainer.max_samples_per_epoch == 1_000_000
    assert cfg.trainer.monitor == "min val_loss_0"
    assert cfg.trainer.init_val is True
    tc = build_tower_config(cfg.arch)
    assert tc.video.num_frames == 4
    assert tc.variant == "baseline"


def test_cli_overrides(tmp_path):
    cfgfile = tmp_path / "c.json"
    with open("/root/repo/configs/pt/cc3m_webvid/norm.json") as f:
        raw = json.load(f)
    raw["trainer"]["save_dir"] = str(tmp_path / "exps")
    cfgfile.write_text(json.dumps(raw))
    exp = load_experiment(
        ["-c", str(cfgfile), "--lr", "0.001", "--bs", "4",
         "--epochs", "7", "--schedule", "3,5"], test=False
    )
    assert exp.cfg.optimizer.lr == 0.001
    assert all(dl.batch_size == 4 for dl in exp.cfg.data_loaders)
    # reference-CLI-parity overrides (args.py:141-143 -lr1/-sc semantics)
    assert exp.cfg.trainer.epochs == 7
    assert exp.cfg.optimizer.milestones == [3, 5]
    # experiment dirs created + config snapshot written
    assert exp.save_dir.exists()
    assert (exp.save_dir / "config.json").exists()
    snap = json.loads((exp.save_dir / "config.json").read_text())
    assert snap["optimizer"]["args"]["lr"] == 0.001


def test_schedule_override_kind(tmp_path):
    """--schedule accepts a kind name too ('cosine'), routed to
    optimizer.args.schedule instead of milestones."""
    cfgfile = tmp_path / "c.json"
    with open("/root/repo/configs/pt/cc3m_webvid/norm.json") as f:
        raw = json.load(f)
    raw["trainer"]["save_dir"] = str(tmp_path / "exps")
    cfgfile.write_text(json.dumps(raw))
    exp = load_experiment(
        ["-c", str(cfgfile), "--schedule", "cosine"], test=False)
    assert exp.cfg.optimizer.schedule == "cosine"
    # milestones untouched by the kind-name form
    assert exp.cfg.optimizer.milestones == raw["optimizer"]["args"].get(
        "milestones", exp.cfg.optimizer.milestones)


def test_schedule_key_rejects_list():
    """Putting decay epochs in optimizer.args.schedule (the kind key) is a
    config error with a pointed message, not a silent misparse."""
    from oatx.config.schema import OptimizerCfg
    with pytest.raises(ValueError, match="milestones"):
        OptimizerCfg.from_dict(
            {"type": "AdamW", "args": {"lr": 1e-4, "schedule": [60, 80]}})


def test_config_required():
    with pytest.raises(SystemExit):
        load_experiment([], test=True)


def test_registry_errors():
    r = Registry("thing")
    r.add("a", 1)
    with pytest.raises(KeyError) as e:
        r.get("b")
    assert "registered: a" in str(e.value)
    assert "t2v_metrics" in METRICS.names()


def test_resume_reads_snapshot(tmp_path):
    with open("/root/repo/configs/ft/msrvtt/zsl/normal.json") as f:
        raw = json.load(f)
    ckpt_dir = tmp_path / "run"
    ckpt_dir.mkdir()
    (ckpt_dir / "config.json").write_text(json.dumps(raw))
    (ckpt_dir / "ckpt-5").write_text("")
    exp = load_experiment(["-r", str(ckpt_dir / "ckpt-5")], test=True)
    assert exp.resume is not None
    assert exp.cfg.name == raw["name"]
