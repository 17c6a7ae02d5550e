"""Joint image(1-frame)+video(4-frame) alternating training — the flagship
CC3M+WebVid pretrain pattern — plus roi_align and the npz cache."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_alternating_frame_counts_train(tmp_path):
    """Two loaders with different num_frames alternate per step through the same
    params (two compiled specializations of one train step)."""
    from oatx.config.schema import ExperimentCfg
    from oatx.data.factory import build_loaders
    from oatx.data.tokenizer import WordPieceTokenizer
    from oatx.train.trainer import Trainer

    def dl(num_frames, sub):
        return {"type": "x", "args": {
            "dataset_name": "SyntheticVideoText",
            "data_dir": str(tmp_path / f"v{sub}"), "object_dir": "",
            "batch_size": 8, "num_workers": 2, "split": "train",
            "video_params": {"input_res": 32, "num_frames": num_frames,
                             "num_videos": 8, "loading": "lax"}}}

    exp = ExperimentCfg.from_dict({
        "name": "joint",
        "arch": {"variant": "baseline", "args": {
            "video_params": {"model": "SpaceTimeTransformer", "num_frames": 4,
                             "input_res": 32, "embed_dim": 32, "depth": 1,
                             "num_heads": 2, "pretrained": False},
            "text_params": {"model": "distilbert-base-uncased", "pretrained": False,
                            "vocab_size": 256, "dim": 32, "hidden_dim": 64,
                            "n_layers": 1, "n_heads": 2},
            "projection_dim": 8}},
        "data_loader": [dl(1, "img"), dl(4, "vid")],
        "optimizer": {"type": "AdamW", "args": {"lr": 1e-3}},
        "loss": {"type": "NormSoftmaxLoss"},
        "metrics": ["t2v_metrics"],
        "trainer": {"epochs": 1, "max_samples_per_epoch": 32,
                    "save_dir": str(tmp_path / "e"), "monitor": "off",
                    "init_val": False, "precision": "f32", "verbosity": 0},
    })
    tok = WordPieceTokenizer.build_from_corpus(
        [f"scene {i} dog cat" for i in range(20)], vocab_size=256)
    loaders = build_loaders(exp, tok)
    assert loaders[0].dataset.num_frames == 1
    assert loaders[1].dataset.num_frames == 4
    tr = Trainer(exp, loaders, [], save_dir=None, log_dir=None)
    hist = tr.train()
    # both loaders contributed per-loader losses (alternating batches)
    assert np.isfinite(hist[1]["loss_0"])
    assert np.isfinite(hist[1]["loss_1"])


def test_roi_align_constant_region(rng):
    from oatx.ops.roi_align import roi_align

    feat = jnp.zeros((1, 8, 8, 3)).at[:, 2:6, 2:6, :].set(5.0)
    boxes = jnp.array([[[2 / 8, 2 / 8, 6 / 8, 6 / 8]]])  # exactly the hot square
    out = roi_align(feat, boxes, output_size=2)
    np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-4)


def test_roi_align_matches_torchvision(rng):
    tv = pytest.importorskip("torchvision")
    import torch

    feat = rng.standard_normal((2, 14, 14, 8)).astype(np.float32)
    boxes = np.stack([
        rng.uniform(0, 0.4, (2, 3)), rng.uniform(0, 0.4, (2, 3)),
        rng.uniform(0.6, 1.0, (2, 3)), rng.uniform(0.6, 1.0, (2, 3)),
    ], axis=-1).astype(np.float32)

    from oatx.ops.roi_align import roi_align

    got = np.asarray(roi_align(jnp.array(feat), jnp.array(boxes),
                               output_size=2, samples_per_bin=2))

    t_feat = torch.from_numpy(feat.transpose(0, 3, 1, 2))
    rois = []
    for b in range(2):
        for k in range(3):
            x1, y1, x2, y2 = boxes[b, k] * 14
            rois.append([b, x1, y1, x2, y2])
    want = tv.ops.roi_align(t_feat, torch.tensor(rois, dtype=torch.float32),
                            output_size=2, sampling_ratio=2, aligned=True)
    want = want.numpy().reshape(2, 3, 8, 2, 2).transpose(0, 1, 3, 4, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_roi_pool_patches(rng):
    from oatx.ops.roi_align import roi_pool_patches

    tokens = jnp.array(rng.standard_normal((2, 196, 16)), jnp.float32)
    boxes = jnp.array(rng.uniform(0.1, 0.9, (2, 5, 4)), jnp.float32)
    boxes = boxes.at[..., 2:].set(jnp.maximum(boxes[..., 2:], boxes[..., :2] + 0.05))
    out = roi_pool_patches(tokens, boxes, grid=14)
    assert out.shape == (2, 5, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_npz_cache(tmp_path, rng):
    from oatx.data import objects as obj

    p = tmp_path / "o.npz"
    info = {"objects_id": np.array([1, 2]), "objects_conf": np.array([0.9, 0.5], np.float32),
            "image_w": 100, "image_h": 100}
    np.savez(p, x=rng.standard_normal((2, 2048)).astype(np.float32),
             bbox=np.array([[0, 0, 50, 50], [10, 10, 60, 60]], np.float32), info=info)
    obj.set_npz_cache(8)
    try:
        a = obj.read_object_features(str(p), top_k=2)
        import os

        os.remove(p)  # cached → second read must still succeed
        b = obj.read_object_features(str(p), top_k=2)
        np.testing.assert_allclose(a, b)
    finally:
        obj.set_npz_cache(0)
    # cache off → missing file falls back to ones
    c = obj.read_object_features(str(p), top_k=2)
    assert np.all(c == 1.0)
