"""Adapter tests against synthetic metadata in the REFERENCE formats
(MSR_VTT.json + split lists, WebVid/CC3M/MSVD/DiDeMo TSVs) with real decodable
fixture clips."""

import json
import os
import pickle

import numpy as np
import pytest

from oatx.config.schema import DataLoaderCfg
from oatx.data import video_reader as vr
from oatx.data.factory import build_dataset


def _clip(path, frames=16):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    vr.write_test_video(str(path), 96, 64, frames, 8)


@pytest.fixture(scope="module")
def msrvtt_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("msrvtt")
    vids = [f"video{i}" for i in range(6)]
    ann = {"annotations": []}
    for i, v in enumerate(vids):
        _clip(root / "videos" / "all" / f"{v}.mp4")
        for c in range(3):
            ann["annotations"].append({"image_id": v, "caption": f"cap {i}-{c}"})
    (root / "annotation").mkdir()
    (root / "annotation" / "MSR_VTT.json").write_text(json.dumps(ann))
    sdir = root / "high-quality" / "structured-symlinks"
    sdir.mkdir(parents=True)
    (sdir / "train_list_jsfusion.txt").write_text("\n".join(vids[:4]))
    (sdir / "val_list_jsfusion.txt").write_text("\n".join(vids[4:]))
    with open(sdir / "jsfusion_val_caption_idx.pkl", "wb") as f:
        pickle.dump({v: 1 for v in vids[4:]}, f)
    return root


def test_msrvtt_train_split(msrvtt_root):
    cfg = DataLoaderCfg(dataset_name="MSRVTT", data_dir=str(msrvtt_root),
                        metadata_dir=str(msrvtt_root), cut="jsfusion",
                        split="train",
                        video_params={"num_frames": 2, "loading": "lax"})
    ds = build_dataset(cfg, "baseline", "train")
    assert len(ds) == 4
    s = ds.get_sample(0, np.random.default_rng(0))
    assert s["video"].shape == (2, 256, 256, 3)
    assert s["text"].startswith("cap 0-")
    # random caption per epoch: different rng can pick different caption
    caps = {ds.get_sample(0, np.random.default_rng(i))["text"] for i in range(10)}
    assert len(caps) > 1


def test_msrvtt_jsfusion_eval_caption_idx(msrvtt_root):
    cfg = DataLoaderCfg(dataset_name="MSRVTT", data_dir=str(msrvtt_root),
                        metadata_dir=str(msrvtt_root), cut="jsfusion",
                        split="test",
                        video_params={"num_frames": 2, "loading": "lax"})
    ds = build_dataset(cfg, "baseline", "test")
    assert len(ds) == 2
    # designated caption index 1 for each eval video
    s = ds.get_sample(0, np.random.default_rng(0))
    assert s["text"].endswith("-1")


def test_msrvtt_miech_cut(msrvtt_root):
    sdir = msrvtt_root / "high-quality" / "structured-symlinks"
    (sdir / "train_list_miech.txt").write_text("video0\nvideo1\nvideo2\n")
    (sdir / "test_list_miech.txt").write_text("video3\nvideo4\nvideo5\n")
    for split, n in (("train", 3), ("test", 3)):
        cfg = DataLoaderCfg(dataset_name="MSRVTT", data_dir=str(msrvtt_root),
                            metadata_dir=str(msrvtt_root), cut="miech", split=split,
                            video_params={"num_frames": 2, "loading": "lax"})
        ds = build_dataset(cfg, "baseline", split)
        assert len(ds) == n
    # eval uses first caption (no jsfusion caption idx for miech)
    s = ds.get_sample(0, np.random.default_rng(0))
    assert s["text"] == "cap 3-0"


def test_msrvtt_challenge_cuts(msrvtt_root):
    """Challenge splits use train_list.txt + {val_list,public_server_*}.txt
    (reference MSRVTT_dataset.py:20-39)."""
    sdir = msrvtt_root / "high-quality" / "structured-symlinks"
    (sdir / "train_list.txt").write_text("video0\nvideo1\nvideo2\nvideo3\n")
    (sdir / "val_list.txt").write_text("video4\n")
    (sdir / "public_server_val.txt").write_text("video4\nvideo5\n")
    (sdir / "public_server_test.txt").write_text("video5\n")
    for cut, n_eval in (("val", 1), ("public_server_val", 2), ("public_server_test", 1)):
        cfg = DataLoaderCfg(dataset_name="MSRVTT", data_dir=str(msrvtt_root),
                            metadata_dir=str(msrvtt_root), cut=cut, split="test",
                            video_params={"num_frames": 2, "loading": "lax"})
        ds = build_dataset(cfg, "baseline", "test")
        assert len(ds) == n_eval, cut
        cfg_tr = DataLoaderCfg(dataset_name="MSRVTT", data_dir=str(msrvtt_root),
                               metadata_dir=str(msrvtt_root), cut=cut, split="train",
                               video_params={"num_frames": 2, "loading": "lax"})
        assert len(build_dataset(cfg_tr, "baseline", "train")) == 4


def test_msrvtt_bad_cut(msrvtt_root):
    cfg = DataLoaderCfg(dataset_name="MSRVTT", data_dir=str(msrvtt_root),
                        metadata_dir=str(msrvtt_root), cut="nonsense", split="train")
    with pytest.raises(ValueError, match="unrecognised MSRVTT cut"):
        build_dataset(cfg, "baseline", "train")


def test_webvid_tsv(tmp_path):
    meta = tmp_path / "meta_data"
    meta.mkdir()
    rows = ["caption\tvideoid"]
    for i in range(3):
        _clip(tmp_path / "train" / f"vid{i}.mp4")
        rows.append(f"a webvid clip {i}\tvid{i}")
    (meta / "webvid_training_success_full.tsv").write_text("\n".join(rows))
    cfg = DataLoaderCfg(dataset_name="WebVid", data_dir=str(tmp_path),
                        metadata_dir=str(tmp_path), split="train",
                        video_params={"num_frames": 2, "loading": "lax"})
    ds = build_dataset(cfg, "baseline", "train")
    assert len(ds) == 3
    s = ds.get_sample(1, np.random.default_rng(0))
    assert s["text"] == "a webvid clip 1"
    assert s["meta"]["paths"] == "vid1.mp4"


def test_cc3m_tsv_image(tmp_path):
    meta = tmp_path / "meta_data"
    meta.mkdir()
    rows = ["caption\tfile"]
    from PIL import Image

    for i in range(3):
        p = tmp_path / "training" / f"img{i}.jpg"
        p.parent.mkdir(exist_ok=True)
        Image.fromarray(
            np.random.default_rng(i).integers(0, 255, (300, 400, 3)).astype(np.uint8)
        ).save(p)
        rows.append(f"an image {i}\timg{i}.jpg")
    (meta / "cc3m_training_success_full.tsv").write_text("\n".join(rows))
    cfg = DataLoaderCfg(dataset_name="ConceptualCaptions3M", data_dir=str(tmp_path),
                        metadata_dir=str(tmp_path), split="train",
                        video_params={"num_frames": 1, "loading": "lax"})
    ds = build_dataset(cfg, "baseline", "train")
    s = ds.get_sample(0, np.random.default_rng(0))
    assert s["video"].shape == (1, 256, 256, 3)  # 1-frame image path via native jpg decode
    assert s["text"] == "an image 0"


def test_msvd_multi_caption(tmp_path):
    meta = tmp_path / "meta_data"
    meta.mkdir()
    _clip(tmp_path / "clipA.avi")
    (meta / "MSVD_train.tsv").write_text(
        "caption\tvideoid\nfirst cap,second cap,third cap\tclipA\n")
    cfg = DataLoaderCfg(dataset_name="MSVD", data_dir=str(tmp_path),
                        metadata_dir=str(tmp_path), split="train",
                        video_params={"num_frames": 2, "loading": "lax"})
    ds = build_dataset(cfg, "baseline", "train")
    caps = {ds.get_sample(0, np.random.default_rng(i))["text"] for i in range(20)}
    assert caps == {"first cap", "second cap", "third cap"}


def test_didemo_tsv(tmp_path):
    meta = tmp_path / "meta_data"
    meta.mkdir()
    _clip(tmp_path / "d" / "x.mp4")
    (meta / "DiDeMo_test.tsv").write_text("caption\tvideoid\na didemo moment\td/x.mp4\n")
    cfg = DataLoaderCfg(dataset_name="DiDeMo", data_dir=str(tmp_path),
                        metadata_dir=str(tmp_path), split="test",
                        video_params={"num_frames": 2, "loading": "lax"})
    ds = build_dataset(cfg, "baseline", "test")
    s = ds.get_sample(0, np.random.default_rng(0))
    assert s["text"] == "a didemo moment"
    # test split → uniform sampling (deterministic across rngs)
    a = ds.get_sample(0, np.random.default_rng(1))
    np.testing.assert_array_equal(s["video"], a["video"])
