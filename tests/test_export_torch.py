"""oatx → torch export roundtrip: export a trained-ish param tree as a
reference-style .pth, import it back, embeddings must be identical."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from oatx.models import convert, towers, distilbert as dbert, vit_spacetime as vst


def test_export_import_roundtrip(tmp_path, rng):
    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(img_size=32, patch_size=16, embed_dim=32,
                                     depth=2, num_heads=2, num_frames=2),
        text=dbert.DistilBertConfig(vocab_size=64, max_position_embeddings=16,
                                    dim=32, hidden_dim=64, n_layers=2, n_heads=2),
        projection_dim=8)
    params = towers.init(jax.random.PRNGKey(3), cfg)
    # randomize the zero-init time attention so the roundtrip covers it
    params["video"]["blocks"]["timeattn"]["qkv"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(4), (2, 32, 96)) * 0.02)

    path = str(tmp_path / "export.pth")
    convert.export_torch_checkpoint(path, params, cfg.video)

    sd = convert.load_torch_checkpoint(path)
    back = convert.frozen_in_time_from_torch(
        sd, cfg.video, cfg.text, fresh_video_params=params["video"])

    batch = {
        "video": jnp.array(rng.standard_normal((2, 2, 32, 32, 3)), jnp.float32),
        "input_ids": jnp.array(rng.integers(0, 64, (2, 8))),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
    }
    t0, v0 = towers.forward_baseline(params, cfg, batch)
    t1, v1 = towers.forward_baseline(back, cfg, batch)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-6)


def test_export_names_match_reference_schema(tmp_path):
    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(img_size=32, patch_size=16, embed_dim=32,
                                     depth=1, num_heads=2, num_frames=1),
        text=dbert.DistilBertConfig(vocab_size=64, max_position_embeddings=16,
                                    dim=32, hidden_dim=64, n_layers=1, n_heads=2),
        projection_dim=8)
    params = towers.init(jax.random.PRNGKey(0), cfg)
    sd = convert.frozen_in_time_to_torch(params, cfg.video)
    expect = [
        "video_model.patch_embed.proj.weight", "video_model.cls_token",
        "video_model.pos_embed", "video_model.temporal_embed",
        "video_model.blocks.0.attn.qkv.weight",
        "video_model.blocks.0.timeattn.proj.bias",
        "video_model.blocks.0.mlp.fc1.weight", "video_model.norm.weight",
        "text_model.embeddings.word_embeddings.weight",
        "text_model.transformer.layer.0.attention.q_lin.weight",
        "text_model.transformer.layer.0.ffn.lin2.bias",
        "text_model.transformer.layer.0.output_layer_norm.weight",
        "txt_proj.1.weight", "vid_proj.0.weight",
    ]
    for k in expect:
        assert k in sd, k
    # torch Linear layout: (out, in)
    assert sd["video_model.blocks.0.attn.qkv.weight"].shape == (96, 32)
    assert sd["video_model.patch_embed.proj.weight"].shape == (32, 3, 16, 16)


def test_export_variant_head_names():
    """Variant projection heads export under the reference Sequential indices
    (txt_proj_2.1 / text_local_proj.1 / vid_local_proj.0) and load into
    reference-shaped torch modules with no missing/unexpected keys."""
    small_vid = vst.SpaceTimeViTConfig(img_size=32, patch_size=16, embed_dim=32,
                                       depth=2, num_heads=2, num_frames=1)
    small_txt = dbert.DistilBertConfig(vocab_size=64, max_position_embeddings=16,
                                       dim=32, hidden_dim=64, n_layers=1, n_heads=2)

    rm = towers.TowerConfig(video=small_vid, text=small_txt, projection_dim=8,
                            variant="region_mem", region_embed_dim=16)
    sd = convert.frozen_in_time_to_torch(towers.init(jax.random.PRNGKey(1), rm), rm.video)
    assert "txt_proj_2.1.weight" in sd and sd["txt_proj_2.1.weight"].shape == (8, 16)
    seq = torch.nn.Sequential(torch.nn.ReLU(), torch.nn.Linear(16, 8))
    seq.load_state_dict({k.split("txt_proj_2.")[1]: torch.from_numpy(v)
                         for k, v in sd.items() if k.startswith("txt_proj_2.")})

    gl = towers.TowerConfig(video=small_vid, text=small_txt, projection_dim=8,
                            variant="global_local")
    sd = convert.frozen_in_time_to_torch(towers.init(jax.random.PRNGKey(2), gl), gl.video)
    assert "text_local_proj.1.weight" in sd and "vid_local_proj.0.weight" in sd
    tl = torch.nn.Sequential(torch.nn.ReLU(), torch.nn.Linear(32, 8))
    tl.load_state_dict({k.split("text_local_proj.")[1]: torch.from_numpy(v)
                        for k, v in sd.items() if k.startswith("text_local_proj.")})
    vl = torch.nn.Sequential(torch.nn.Linear(32, 8))
    vl.load_state_dict({k.split("vid_local_proj.")[1]: torch.from_numpy(v)
                        for k, v in sd.items() if k.startswith("vid_local_proj.")})


def test_export_import_roundtrip_bert(tmp_path, rng):
    """bert text tower exports under HF BertModel key schema (reference
    model.py:30-40 accepts 'bert-base-uncased') and round-trips exactly."""
    from oatx.models.bert import BertConfig

    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(img_size=32, patch_size=16, embed_dim=32,
                                     depth=2, num_heads=2, num_frames=2),
        text=BertConfig(vocab_size=64, max_position_embeddings=16,
                        type_vocab_size=2, dim=32, hidden_dim=64,
                        n_layers=2, n_heads=2),
        text_family="bert", projection_dim=8)
    params = towers.init(jax.random.PRNGKey(5), cfg)

    path = str(tmp_path / "export_bert.pth")
    convert.export_torch_checkpoint(path, params, cfg.video, text_family="bert")
    sd = convert.load_torch_checkpoint(path)
    back = convert.frozen_in_time_from_torch(
        sd, cfg.video, cfg.text, fresh_video_params=params["video"],
        text_family="bert")

    batch = {
        "video": jnp.array(rng.standard_normal((2, 2, 32, 32, 3)), jnp.float32),
        "input_ids": jnp.array(rng.integers(0, 64, (2, 8))),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
    }
    t0, v0 = towers.forward_baseline(params, cfg, batch)
    t1, v1 = towers.forward_baseline(back, cfg, batch)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-6)


def test_export_bert_loads_into_hf_bertmodel():
    """Zero-missing-key load into the reference-schema torch module
    (transformers.BertModel) — VERDICT r3 item 6 acceptance."""
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    from oatx.models.bert import BertConfig

    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(img_size=32, patch_size=16, embed_dim=32,
                                     depth=1, num_heads=2, num_frames=1),
        text=BertConfig(vocab_size=64, max_position_embeddings=16,
                        type_vocab_size=2, dim=32, hidden_dim=64,
                        n_layers=2, n_heads=2),
        text_family="bert", projection_dim=8)
    params = towers.init(jax.random.PRNGKey(6), cfg)
    sd = convert.frozen_in_time_to_torch(params, cfg.video, text_family="bert")
    text_sd = {k[len("text_model."):]: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items() if k.startswith("text_model.")}
    hf = BertModel(HFBertConfig(
        vocab_size=64, max_position_embeddings=16, type_vocab_size=2,
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2))
    missing, unexpected = hf.load_state_dict(text_sd, strict=False)
    # non-persistent buffers (position_ids) may be "missing"; no real params may be
    assert [k for k in missing if not k.endswith("position_ids")] == []
    assert unexpected == []
