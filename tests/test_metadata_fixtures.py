"""Real-format metadata fixtures: exercise the MSRVTT (all cuts incl.
challenge/public-server), DiDeMo and LSMDC/LSMDC_choice adapters against
metadata trees written in the REFERENCE's exact on-disk formats
(MSRVTT_dataset.py:10-66, DiDeMo_dataset.py:7-20, LSMDC_dataset.py:8-49),
then run the eval CLI end-to-end over one of them."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from oatx.config.schema import DataLoaderCfg
from oatx.data.factory import build_dataset


def _write_video(path, w=64, h=48, frames=20):
    from oatx.data import video_reader as vr

    os.makedirs(os.path.dirname(path), exist_ok=True)
    vr.write_test_video(path, w, h, frames, 8)


# --------------------------------------------------------------- MSR-VTT

@pytest.fixture(scope="module")
def msrvtt_root(tmp_path_factory):
    """Fixture tree in the reference's exact layout:
    annotation/MSR_VTT.json, high-quality/structured-symlinks/<lists>,
    videos/all/<id>.mp4."""
    root = tmp_path_factory.mktemp("msrvtt")
    vids = [f"video{i}" for i in range(8)]
    anns = []
    for i, v in enumerate(vids):
        for c in range(3):  # 3 captions per video
            anns.append({"image_id": v, "caption": f"caption {c} of clip {i}"})
    os.makedirs(root / "annotation")
    (root / "annotation" / "MSR_VTT.json").write_text(
        json.dumps({"annotations": anns}))

    sdir = root / "high-quality" / "structured-symlinks"
    os.makedirs(sdir)
    train, test = vids[:5], vids[5:]
    (sdir / "train_list_jsfusion.txt").write_text("\n".join(train) + "\n")
    (sdir / "val_list_jsfusion.txt").write_text("\n".join(test) + "\n")
    with open(sdir / "jsfusion_val_caption_idx.pkl", "wb") as f:
        pickle.dump({v: (i % 3) for i, v in enumerate(test)}, f)
    (sdir / "train_list_miech.txt").write_text("\n".join(train) + "\n")
    (sdir / "test_list_miech.txt").write_text("\n".join(test) + "\n")
    (sdir / "train_list_full.txt").write_text("\n".join(train) + "\n")
    (sdir / "val_list_full.txt").write_text("\n".join(test[:2]) + "\n")
    (sdir / "test_list_full.txt").write_text("\n".join(test[1:]) + "\n")
    # challenge / public-server cuts (MSRVTT_dataset.py:20-40)
    (sdir / "train_list.txt").write_text("\n".join(train) + "\n")
    (sdir / "val_list.txt").write_text("\n".join(test) + "\n")
    (sdir / "public_server_val.txt").write_text("\n".join(test[:2]) + "\n")
    (sdir / "public_server_test.txt").write_text("\n".join(test) + "\n")

    for v in vids:
        _write_video(str(root / "videos" / "all" / f"{v}.mp4"))
    return root


def _msrvtt_cfg(root, cut, split):
    return DataLoaderCfg(
        type="TextVideoDataLoader", dataset_name="MSRVTT",
        data_dir=str(root), cut=cut, split=split, batch_size=2, num_workers=1,
        video_params={"input_res": 32, "num_frames": 2, "loading": "strict"})


@pytest.mark.parametrize("cut,split,expect", [
    ("jsfusion", "train", 5), ("jsfusion", "test", 3),
    ("miech", "test", 3),
    ("full-val", "test", 2), ("full-test", "test", 2),
    ("val", "test", 3),
    ("public_server_val", "test", 2), ("public_server_test", "test", 3),
])
def test_msrvtt_cuts_load_and_decode(msrvtt_root, cut, split, expect):
    ds = build_dataset(_msrvtt_cfg(msrvtt_root, cut, split), variant="baseline")
    assert len(ds) == expect
    s = ds.get_sample(0, np.random.default_rng(0))
    assert s["video"].shape[0] == 2 and s["video"].dtype == np.uint8
    assert isinstance(s["text"], str) and s["text"]


def test_msrvtt_jsfusion_uses_designated_caption_idx(msrvtt_root):
    ds = build_dataset(_msrvtt_cfg(msrvtt_root, "jsfusion", "test"),
                       variant="baseline")
    # video5 → idx 0, video6 → idx 1, video7 → idx 2 (the pkl above)
    caps = [r["captions"] for r in ds.metadata]
    assert all(len(c) == 1 for c in caps)
    assert caps[0] == ["caption 0 of clip 5"]
    assert caps[1] == ["caption 1 of clip 6"]
    assert caps[2] == ["caption 2 of clip 7"]


# --------------------------------------------------------------- DiDeMo

def test_didemo_tsv_format(tmp_path):
    meta = tmp_path / "meta_data"
    os.makedirs(meta)
    rows = ["caption\tvideo"]  # header row (reference reads with header)
    for i in range(4):
        rel = f"part{i % 2}/vid{i}.mp4"
        rows.append(f"a didemo moment {i}\t{rel}")
        _write_video(str(tmp_path / rel))
    for split in ("DiDeMo_train.tsv", "DiDeMo_val.tsv", "DiDeMo_test.tsv"):
        (meta / split).write_text("\n".join(rows) + "\n")

    cfg = DataLoaderCfg(
        type="TextVideoDataLoader", dataset_name="DiDeMo",
        data_dir=str(tmp_path), split="val", batch_size=2, num_workers=1,
        video_params={"input_res": 32, "num_frames": 2, "loading": "strict"})
    ds = build_dataset(cfg, variant="baseline")
    assert len(ds) == 4
    s = ds.get_sample(1, np.random.default_rng(0))
    assert s["text"] == "a didemo moment 1"
    assert s["video"].shape[0] == 2


# --------------------------------------------------------------- LSMDC

@pytest.fixture(scope="module")
def lsmdc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("lsmdc")
    sdir = root / "structured-symlinks"
    os.makedirs(sdir)
    stems = [f"1001_Movie_{i:05d}" for i in range(6)]
    (sdir / "train_list.txt").write_text("\n".join(stems[:4]) + "\n")
    (sdir / "val_list.txt").write_text("\n".join(stems[4:]) + "\n")
    (sdir / "test_list.txt").write_text("\n".join(stems[4:]) + "\n")
    # raw-captions.pkl: dict videoid → list of TOKEN LISTS (reference joins
    # with spaces, LSMDC_dataset.py:41)
    caps = {s: [["someone", "walks", "in", "scene", str(i)]]
            for i, s in enumerate(stems)}
    with open(sdir / "raw-captions.pkl", "wb") as f:
        pickle.dump(caps, f)
    # frame_tar_list.txt: paths whose last two components map stems to movie
    # dirs (LSMDC_dataset.py:29-33)
    (root / "frame_tar_list.txt").write_text(
        "\n".join(f"/remote/frames/1001_Movie/{s}.tar" for s in stems) + "\n")
    for s in stems:
        _write_video(str(root / "videos" / "1001_Movie" / f"{s}.avi"))
    return root


def test_lsmdc_frame_tar_layout(lsmdc_root):
    cfg = DataLoaderCfg(
        type="TextVideoDataLoader", dataset_name="LSMDC",
        data_dir=str(lsmdc_root), split="val", batch_size=2, num_workers=1,
        video_params={"input_res": 32, "num_frames": 2, "loading": "strict"})
    ds = build_dataset(cfg, variant="baseline")
    assert len(ds) == 2
    s = ds.get_sample(0, np.random.default_rng(0))
    assert s["text"].startswith("someone walks in scene")
    assert s["video"].shape[0] == 2


def test_lsmdc_choice_carries_choices(lsmdc_root):
    cfg = DataLoaderCfg(
        type="TextVideoDataLoader", dataset_name="LSMDC_choice",
        data_dir=str(lsmdc_root), split="test", batch_size=2, num_workers=1,
        video_params={"input_res": 32, "num_frames": 2, "loading": "strict"})
    ds = build_dataset(cfg, variant="baseline")
    s = ds.get_sample(0, np.random.default_rng(0))
    assert "choices" in s["meta"] and "answer" in s["meta"]


# ------------------------------------------------------ e2e: eval CLI

def test_eval_cli_over_msrvtt_fixture(msrvtt_root, tmp_path):
    """Full test-CLI run over the reference-format MSRVTT jsfusion fixture:
    config → adapter → decode → towers → metrics, in a fresh process."""
    cfg = {
        "name": "fixture-msrvtt",
        "arch": {"variant": "baseline", "args": {
            "video_params": {"model": "SpaceTimeTransformer", "num_frames": 2,
                             "input_res": 32, "embed_dim": 32, "depth": 1,
                             "num_heads": 2, "pretrained": False},
            "text_params": {"model": "distilbert-base-uncased", "pretrained": False,
                            "vocab_size": 256, "dim": 32, "hidden_dim": 64,
                            "n_layers": 1, "n_heads": 2},
            "projection_dim": 8}},
        "data_loader": [{"type": "TextVideoDataLoader", "args": {
            "dataset_name": "MSRVTT", "data_dir": str(msrvtt_root),
            "cut": "jsfusion", "split": "test", "batch_size": 8,
            "num_workers": 1,
            "video_params": {"input_res": 32, "num_frames": 2,
                             "loading": "strict"}}}],
        "optimizer": {"type": "AdamW", "args": {"lr": 1e-3}},
        "loss": {"type": "NormSoftmaxLoss"},
        "metrics": ["t2v_metrics"],
        "trainer": {"epochs": 1, "save_dir": str(tmp_path / "e"),
                    "monitor": "off", "precision": "f32", "verbosity": 2},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["OATX_PLATFORM"] = "cpu"  # in-code pin; JAX_PLATFORMS alone is overridden by the axon sitecustomize
    out = subprocess.run(
        [sys.executable, "-m", "oatx.cli.test", "-c", str(cfg_path)],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=1800)
    assert out.returncode == 0, out.stderr[-2500:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    metrics = json.loads(line)
    assert "t2v_metrics" in metrics and "R1" in metrics["t2v_metrics"]


def test_lsmdc_choice_loads_mc_annotations(lsmdc_root):
    """multiple_choice_{split}.tsv (videoid \t answer \t candidates...) is the
    working replacement for the reference's bit-rotten choice dataset."""
    sdir = lsmdc_root / "structured-symlinks"
    stems = ["1001_Movie_00004", "1001_Movie_00005"]
    rows = [f"{s}\t{i + 1}\twrong one\tsomeone walks in scene\tanother wrong"
            for i, s in enumerate(stems)]
    (sdir / "multiple_choice_test.tsv").write_text("\n".join(rows) + "\n")
    try:
        cfg = DataLoaderCfg(
            type="TextVideoDataLoader", dataset_name="LSMDC_choice",
            data_dir=str(lsmdc_root), split="test", batch_size=2, num_workers=1,
            video_params={"input_res": 32, "num_frames": 2, "loading": "strict"})
        ds = build_dataset(cfg, variant="baseline")
        s0 = ds.get_sample(0, np.random.default_rng(0))
        assert s0["meta"]["choices"] == ["wrong one", "someone walks in scene",
                                         "another wrong"]
        assert s0["meta"]["answer"] == 1
        s1 = ds.get_sample(1, np.random.default_rng(0))
        assert s1["meta"]["answer"] == 2
    finally:
        os.remove(sdir / "multiple_choice_test.tsv")
