"""Full reference-checkpoint import parity: a torch FrozenInTime-style state
dict (video_model.* + text_model.* + txt_proj.1 + vid_proj.0, with a 'module.'
DataParallel prefix) must import into oatx and reproduce the reference
pipeline's embeddings (BASELINE target: cosine ≥ 0.999)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def reference_checkpoint():
    from torch_oracles import load_reference_video_transformer

    mod = load_reference_video_transformer()
    if mod is None:
        pytest.skip("reference unavailable")
    from transformers import DistilBertConfig, DistilBertModel

    torch.manual_seed(0)
    video_model = mod.SpaceTimeTransformer(num_frames=4, time_init="zeros")
    video_model.head = torch.nn.Identity()
    video_model.pre_logits = torch.nn.Identity()
    with torch.no_grad():
        video_model.temporal_embed.normal_(0, 0.02)
        # give time attention real weights so the divided path is exercised
        for blk in video_model.blocks:
            blk.timeattn.qkv.weight.normal_(0, 0.02)
            blk.timeattn.qkv.bias.zero_()
            blk.timeattn.proj.weight.normal_(0, 0.02)
            blk.timeattn.proj.bias.zero_()
    text_model = DistilBertModel(DistilBertConfig()).eval()
    txt_proj = torch.nn.Sequential(torch.nn.ReLU(), torch.nn.Linear(768, 256))
    vid_proj = torch.nn.Sequential(torch.nn.Linear(768, 256))

    sd = {}
    for prefix, m in (("video_model.", video_model), ("text_model.", text_model),
                      ("txt_proj.", txt_proj), ("vid_proj.", vid_proj)):
        for k, v in m.state_dict().items():
            sd["module." + prefix + k] = v.numpy()  # DataParallel-style prefix
    return sd, video_model.eval(), text_model, txt_proj.eval(), vid_proj.eval()


def test_full_checkpoint_import_cosine(reference_checkpoint):
    sd, video_model, text_model, txt_proj, vid_proj = reference_checkpoint
    from oatx.models import convert, towers, distilbert as dbert, vit_spacetime as vst

    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(num_frames=4, time_init="zeros"),
        text=dbert.DistilBertConfig(), projection_dim=256)
    params = convert.frozen_in_time_from_torch(sd, cfg.video, cfg.text)

    rng = np.random.default_rng(0)
    video = rng.standard_normal((2, 4, 224, 224, 3)).astype(np.float32)
    ids = rng.integers(0, 30522, (2, 12)).astype(np.int64)
    mask = np.ones((2, 12), np.int64)

    # reference pipeline (model.py:103-117)
    with torch.no_grad():
        cls, _ = video_model.forward_features(
            torch.from_numpy(video.transpose(0, 1, 4, 2, 3)))
        want_v = vid_proj(cls).numpy()
        th = text_model(torch.from_numpy(ids),
                        attention_mask=torch.from_numpy(mask)).last_hidden_state[:, 0]
        want_t = txt_proj(th).numpy()

    got_t, got_v = towers.forward_baseline(params, cfg, {
        "video": jnp.array(video), "input_ids": jnp.array(ids),
        "attention_mask": jnp.array(mask)})

    def cos(a, b):
        a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
        return a @ b / (np.linalg.norm(a) * np.linalg.norm(b))

    assert cos(got_v, want_v) > 0.999
    assert cos(got_t, want_t) > 0.999
    np.testing.assert_allclose(np.asarray(got_t), want_t, atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(got_v), want_v, atol=2e-3, rtol=1e-2)


def test_temporal_inflation_on_import(reference_checkpoint):
    """Import a 4-frame checkpoint into an 8-frame model: temporal embed is
    zero-padded ('zeros' fix) and the forward still runs."""
    sd, *_ = reference_checkpoint
    from oatx.models import convert, towers, distilbert as dbert, vit_spacetime as vst

    cfg8 = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(num_frames=8, time_init="zeros"),
        text=dbert.DistilBertConfig(), projection_dim=256)
    params = convert.frozen_in_time_from_torch(sd, cfg8.video, cfg8.text)
    te = np.asarray(params["video"]["temporal_embed"])
    assert te.shape[1] == 8
    assert np.abs(te[:, 4:]).max() == 0  # zero-padded tail
    assert np.abs(te[:, :4]).max() > 0


def test_import_via_checkpoint_module(reference_checkpoint, tmp_path):
    """import_initial_weights loads a .pth file end-to-end (torch.save round trip)."""
    sd, *_ = reference_checkpoint
    import torch as th

    from oatx.models import towers, distilbert as dbert, vit_spacetime as vst
    from oatx.train.checkpoint import import_initial_weights

    path = tmp_path / "ref.pth"
    th.save({"state_dict": {k: th.from_numpy(np.asarray(v)) for k, v in sd.items()}},
            str(path))
    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(num_frames=4), text=dbert.DistilBertConfig())
    fresh = towers.init(jax.random.PRNGKey(0), cfg)
    params = import_initial_weights(str(path), cfg, fresh)
    assert "txt_proj" in params and "vid_proj" in params
    # projection weights actually came from the checkpoint
    want = np.asarray(sd["module.vid_proj.0.weight"]).T
    np.testing.assert_allclose(np.asarray(params["vid_proj"]["kernel"]), want, atol=1e-6)
