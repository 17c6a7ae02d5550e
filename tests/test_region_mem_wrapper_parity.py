"""Wrapper-level golden parity for the region-memory dual tower.

Reconstructs the reference oa_model_region_mem.py pipeline in torch — region
video tower (layer-6 tap, region_norm) + HF DistilBERT + the exact 'minimal'
projection stack (txt_proj/txt_proj_2 = Sequential(ReLU, Linear), vid_proj =
Sequential(Linear)) — runs the reference forward math
(oa_model_region_mem.py:105-151), then imports the same weights through
convert.frozen_in_time_from_torch and checks towers.forward_region_mem
reproduces text/video embeddings and region similarities.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from oatx.models import convert, distilbert as dbert, towers, vit_spacetime as vst


def _cos(a, b):
    a, b = np.ravel(a), np.ravel(b)
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))


@pytest.fixture(scope="module")
def reference_pipeline():
    from torch_oracles import REFERENCE_OA_REGION, load_reference_module

    mod = load_reference_module(REFERENCE_OA_REGION, "ref_oa_region_wrap")
    if mod is None:
        pytest.skip("reference repo not available as oracle")
    from transformers import DistilBertConfig, DistilBertModel

    torch.manual_seed(7)
    video_model = mod.SpaceTimeTransformer(num_frames=4, time_init="random",
                                           attention_style="frozen-in-time")
    video_model.head = torch.nn.Identity()
    video_model.pre_logits = torch.nn.Identity()
    with torch.no_grad():
        video_model.temporal_embed.normal_(0, 0.02)
        video_model.region_norm.weight.normal_(1, 0.2)
        video_model.region_norm.bias.normal_(0, 0.1)
    text_model = DistilBertModel(DistilBertConfig())
    # projections exactly as the reference builds them (oa_model_region_mem.py:66-77)
    txt_proj = torch.nn.Sequential(torch.nn.ReLU(), torch.nn.Linear(768, 256))
    txt_proj_2 = torch.nn.Sequential(torch.nn.ReLU(), torch.nn.Linear(512, 256))
    vid_proj = torch.nn.Sequential(torch.nn.Linear(768, 256))
    for m in (video_model, text_model, txt_proj, txt_proj_2, vid_proj):
        m.eval()
    return video_model, text_model, txt_proj, txt_proj_2, vid_proj


def test_region_mem_wrapper_parity(reference_pipeline):
    video_model, text_model, txt_proj, txt_proj_2, vid_proj = reference_pipeline
    B, F, K = 2, 4, 5
    rng = np.random.default_rng(11)
    video = rng.standard_normal((B, F, 224, 224, 3)).astype(np.float32)
    object_frame = rng.standard_normal((B, 1, 224, 224, 3)).astype(np.float32)
    clip_rows = rng.standard_normal((B, K, 512)).astype(np.float32)
    input_ids = rng.integers(0, 30522, (B, 20))
    attention_mask = np.ones((B, 20), np.int64)

    # ---- reference forward math (oa_model_region_mem.py:105-151)
    with torch.no_grad():
        t_text_all = text_model(torch.from_numpy(input_ids),
                                attention_mask=torch.from_numpy(attention_mask))
        t_text = txt_proj(t_text_all.last_hidden_state[:, 0, :])

        def ref_video(x):
            cls, region = video_model.forward_features(
                torch.from_numpy(x.transpose(0, 1, 4, 2, 3)))
            return vid_proj(cls), vid_proj(region)

        _, obj_region = ref_video(object_frame)
        vid_cls, vid_region = ref_video(video)
        t_video = (vid_cls + torch.mean(vid_region, dim=1)) / 2
        t_region_txt = txt_proj_2(torch.from_numpy(clip_rows))
        t_region_sim = torch.sigmoid(
            torch.einsum("bkf,bnf->bkn", t_region_txt, obj_region))

    # ---- import the same weights into oatx through the converter
    sd = {}
    for k, v in video_model.state_dict().items():
        sd["video_model." + k] = v.numpy()
    for k, v in text_model.state_dict().items():
        sd["text_model." + k] = v.numpy()
    for k, v in txt_proj.state_dict().items():
        sd["txt_proj." + k] = v.numpy()
    for k, v in txt_proj_2.state_dict().items():
        sd["txt_proj_2." + k] = v.numpy()
    for k, v in vid_proj.state_dict().items():
        sd["vid_proj." + k] = v.numpy()

    video_cfg = vst.SpaceTimeViTConfig(num_frames=F, time_init="random",
                                       region_tap_layer=6)
    cfg = towers.TowerConfig(video=video_cfg, text=dbert.DistilBertConfig(),
                             projection_dim=256, variant="region_mem")
    params = towers.init(jax.random.PRNGKey(0), cfg)
    imported = convert.frozen_in_time_from_torch(sd, video_cfg, fresh_video_params=params["video"])
    for k in ("video", "text", "txt_proj", "vid_proj", "txt_proj_2"):
        assert k in imported, f"converter dropped {k}"
        params[k] = imported[k]

    out = towers.forward_region_mem(params, cfg, {
        "input_ids": jnp.asarray(input_ids),
        "attention_mask": jnp.asarray(attention_mask),
        "video": jnp.asarray(video),
        "object_frame": jnp.asarray(object_frame),
        "text_region_embedding": jnp.asarray(clip_rows),
    })

    assert _cos(np.asarray(out["text_embeds"]), t_text.numpy()) > 0.999
    np.testing.assert_allclose(np.asarray(out["text_embeds"]), t_text.numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["video_embeds"]), t_video.numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(out["region_sim_logits"])),
                               t_region_sim.numpy(), atol=5e-4, rtol=1e-3)
