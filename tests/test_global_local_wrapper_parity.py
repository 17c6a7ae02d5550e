"""Wrapper-level golden parity for the global-local dual tower.

Reconstructs the reference oa_model_global_local.py pipeline in torch —
global-local video tower (½·CLS + ½·mean pooling, last-layer regions) + HF
DistilBERT + the 'minimal' projection stack incl. the fine-grained
text_local_proj (Sequential(ReLU, Linear)) / vid_local_proj
(Sequential(Linear)) heads — runs the reference forward math
(oa_model_global_local.py:149-222, including the tags-mask double loop),
then imports the same weights through convert.frozen_in_time_from_torch and
checks towers.forward_global_local reproduces every output stream.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from oatx.models import convert, distilbert as dbert, towers, vit_spacetime as vst


@pytest.fixture(scope="module")
def reference_pipeline():
    from torch_oracles import REFERENCE_OA_GLOBAL_LOCAL, load_reference_module

    mod = load_reference_module(REFERENCE_OA_GLOBAL_LOCAL, "ref_oa_gl_wrap")
    if mod is None:
        pytest.skip("reference repo not available as oracle")
    from transformers import DistilBertConfig, DistilBertModel

    torch.manual_seed(9)
    video_model = mod.SpaceTimeTransformer(num_frames=4, time_init="random",
                                           attention_style="frozen-in-time")
    video_model.head = torch.nn.Identity()
    video_model.pre_logits = torch.nn.Identity()
    with torch.no_grad():
        video_model.temporal_embed.normal_(0, 0.02)
    text_model = DistilBertModel(DistilBertConfig())
    # projections exactly as the reference builds them (oa_model_global_local.py:100-135)
    txt_proj = torch.nn.Sequential(torch.nn.ReLU(), torch.nn.Linear(768, 256))
    text_local_proj = torch.nn.Sequential(torch.nn.ReLU(), torch.nn.Linear(768, 256))
    vid_proj = torch.nn.Sequential(torch.nn.Linear(768, 256))
    vid_local_proj = torch.nn.Sequential(torch.nn.Linear(768, 256))
    for m in (video_model, text_model, txt_proj, text_local_proj, vid_proj, vid_local_proj):
        m.eval()
    return video_model, text_model, txt_proj, text_local_proj, vid_proj, vid_local_proj


def test_global_local_wrapper_parity(reference_pipeline):
    (video_model, text_model, txt_proj, text_local_proj,
     vid_proj, vid_local_proj) = reference_pipeline
    B, F, O, N = 2, 4, 5, 196
    L, PL = 14, 24
    rng = np.random.default_rng(13)
    video = rng.standard_normal((B, F, 224, 224, 3)).astype(np.float32)
    object_frame = rng.standard_normal((B, 1, 224, 224, 3)).astype(np.float32)
    input_ids = rng.integers(0, 30522, (B, L))
    attention_mask = np.zeros((B, L), np.int64)
    attention_mask[0, :9] = 1
    attention_mask[1, :12] = 1
    pad_input_ids = rng.integers(0, 30522, (B, PL))
    pad_attention_mask = np.ones((B, PL), np.int64)
    patch_masks = (rng.random((B, O, N)) < 0.1).astype(np.float32)
    # cumulative tag-token end offsets per object (reference object_token_masks)
    lens = rng.integers(1, 3, (B, O))
    object_token_masks = np.cumsum(lens, axis=1).astype(np.int32)

    # ---- reference forward math (oa_model_global_local.py:149-222)
    with torch.no_grad():
        def ref_text(ids, mask):
            h = text_model(torch.from_numpy(ids),
                           attention_mask=torch.from_numpy(mask)).last_hidden_state
            emb = txt_proj(h[:, 0, :] + torch.mean(h[:, 1:, :], dim=1))
            return emb, h

        t_text, _text_tokens = ref_text(input_ids, attention_mask)
        t_pad_text, pad_tokens = ref_text(pad_input_ids, pad_attention_mask)

        def ref_video(x):
            cls, region = video_model.forward_features(
                torch.from_numpy(x.transpose(0, 1, 4, 2, 3)))
            return vid_proj(cls), region

        t_obj_emb, obj_region = ref_video(object_frame)
        t_vid_emb, _ = ref_video(video)

        region_feat = torch.einsum("bol,blc->boc",
                                   torch.from_numpy(patch_masks), obj_region)
        # the reference's tags-mask double loop (oa_model_global_local.py:189-197)
        tags_masks = torch.zeros(B, O, PL)
        for j in range(B):
            start = 0
            tl = int(attention_mask[j].sum())
            for k in range(O):
                tags_masks[j][k][tl - 1 + start: tl - 1 + int(object_token_masks[j][k])] = 1
                start = int(object_token_masks[j][k])
        tags_feat = torch.einsum("bol,blc->boc", tags_masks, pad_tokens)
        t_region_feat = vid_local_proj(region_feat)
        t_tags_feat = text_local_proj(tags_feat)

    # ---- import the same weights into oatx through the converter
    sd = {}
    for prefix, m in (("video_model.", video_model), ("text_model.", text_model),
                      ("txt_proj.", txt_proj), ("text_local_proj.", text_local_proj),
                      ("vid_proj.", vid_proj), ("vid_local_proj.", vid_local_proj)):
        for k, v in m.state_dict().items():
            sd[prefix + k] = v.numpy()

    video_cfg = vst.SpaceTimeViTConfig(num_frames=F, time_init="random",
                                       pooling="cls_mean_half")
    cfg = towers.TowerConfig(video=video_cfg, text=dbert.DistilBertConfig(),
                             projection_dim=256, variant="global_local")
    params = towers.init(jax.random.PRNGKey(0), cfg)
    imported = convert.frozen_in_time_from_torch(sd, video_cfg,
                                                 fresh_video_params=params["video"])
    for k in ("video", "text", "txt_proj", "vid_proj",
              "txt_local_proj", "vid_local_proj"):
        assert k in imported, f"converter dropped {k}"
        params[k] = imported[k]

    out = towers.forward_global_local(params, cfg, {
        "input_ids": jnp.asarray(input_ids),
        "attention_mask": jnp.asarray(attention_mask),
        "pad_input_ids": jnp.asarray(pad_input_ids),
        "pad_attention_mask": jnp.asarray(pad_attention_mask),
        "video": jnp.asarray(video),
        "object_frame": jnp.asarray(object_frame),
        "patch_masks": jnp.asarray(patch_masks),
        "object_token_masks": jnp.asarray(object_token_masks),
    })

    for got_key, want in (("text_embeds", t_text), ("pad_text_embeds", t_pad_text),
                          ("video_embeds", t_vid_emb), ("object_img_embeds", t_obj_emb),
                          ("region_feat", t_region_feat), ("tags_feat", t_tags_feat)):
        np.testing.assert_allclose(np.asarray(out[got_key]), want.numpy(),
                                   atol=5e-4, rtol=1e-3, err_msg=got_key)
