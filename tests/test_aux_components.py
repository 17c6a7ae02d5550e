"""BERT tower, prompt learner, text aug, crops, plots, multi-stream eval."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def test_bert_parity():
    from transformers import BertConfig as HFBertConfig, BertModel

    from oatx.models import bert

    torch.manual_seed(0)
    hf_cfg = HFBertConfig(num_hidden_layers=2, hidden_size=64,
                          intermediate_size=128, num_attention_heads=4,
                          vocab_size=100, max_position_embeddings=32)
    m = BertModel(hf_cfg).eval()
    cfg = bert.BertConfig(vocab_size=100, max_position_embeddings=32, dim=64,
                          hidden_dim=128, n_layers=2, n_heads=4)
    params = bert.bert_from_torch({k: v.numpy() for k, v in m.state_dict().items()}, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 100, (2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    with torch.no_grad():
        out = m(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
    hidden, pooled = bert.apply(params, cfg, jnp.array(ids), jnp.array(mask))
    np.testing.assert_allclose(np.asarray(hidden), out.last_hidden_state.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_bert_tower_through_config():
    from oatx.config.schema import ArchCfg, build_tower_config
    from oatx.models import towers

    arch = ArchCfg.from_dict({
        "type": "FrozenInTime",
        "args": {
            "video_params": {"model": "SpaceTimeTransformer", "num_frames": 1,
                             "input_res": 32, "embed_dim": 32, "depth": 1,
                             "num_heads": 2},
            "text_params": {"model": "bert-base-uncased", "vocab_size": 100,
                            "dim": 32, "hidden_dim": 64, "n_layers": 1,
                            "n_heads": 2},
            "projection_dim": 8,
        },
    })
    cfg = build_tower_config(arch)
    assert cfg.text_family == "bert"
    params = towers.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    t, v = towers.forward(params, cfg, {
        "video": jnp.array(rng.standard_normal((2, 1, 32, 32, 3)), jnp.float32),
        "input_ids": jnp.array(rng.integers(0, 100, (2, 6))),
        "attention_mask": jnp.ones((2, 6), jnp.int32),
    })
    assert t.shape == (2, 8) and v.shape == (2, 8)


def test_prompt_learner():
    from oatx.data.tokenizer import WordPieceTokenizer
    from oatx.models import distilbert as dbert, prompt_learner as pl

    tcfg = dbert.DistilBertConfig(vocab_size=64, max_position_embeddings=32,
                                  dim=32, hidden_dim=64, n_layers=1, n_heads=2)
    tparams = dbert.init(jax.random.PRNGKey(0), tcfg)
    tok = WordPieceTokenizer.build_from_corpus(
        ["dog cat car person tree"], vocab_size=64)
    pcfg = pl.PromptConfig(n_ctx=4, max_name_tokens=4)
    pparams = pl.init(jax.random.PRNGKey(1), tcfg, pcfg)
    names = ["dog", "cat", "car"]
    ids = pl.encode_class_names(tok, names, pcfg)
    cls_emb = pl.class_embeddings(pparams, tparams, tcfg, ids,
                                  tok.cls_id, tok.pad_id, pcfg)
    assert cls_emb.shape == (3, 32)
    logits = pl.classify(jnp.array(np.random.default_rng(0).standard_normal((5, 32)),
                                   jnp.float32), cls_emb)
    assert logits.shape == (5, 3)
    # learnable: gradient flows into ctx
    g = jax.grad(lambda pp: jnp.sum(pl.class_embeddings(
        pp, tparams, tcfg, ids, tok.cls_id, tok.pad_id, pcfg)))(pparams)
    assert float(jnp.abs(g["ctx"]).sum()) > 0


def test_text_aug(rng):
    from oatx.data import text_aug as ta

    cap = "a brown dog runs across the green field"
    out = ta.eda(cap, rng)
    assert isinstance(out, str) and len(out) > 0
    shuffled = ta.shuffle_object_tags("dog cat car", np.random.default_rng(3))
    assert sorted(shuffled.split()) == ["car", "cat", "dog"]
    injected = ta.add_pseudo_class("dog cat", ["zebra"], n=1, rng=rng)
    assert "zebra" in injected and len(injected.split()) == 3
    masked = ta.mask_words(cap, p=1.0, rng=rng)
    assert set(masked.split()) == {"[MASK]"}
    # determinism with fixed seed
    assert ta.eda(cap, np.random.default_rng(5)) == ta.eda(cap, np.random.default_rng(5))


def test_crops(rng):
    from oatx.data import crops

    frames = rng.integers(0, 255, (2, 100, 160, 3)).astype(np.uint8)
    c = crops.center_crop_np(frames, 96)
    assert c.shape == (2, 96, 96, 3)
    five = crops.border_crops(frames, 64)
    assert len(five) == 5 and all(f.shape == (2, 64, 64, 3) for f in five)
    l, r = crops.two_hori_crop(frames, 96)
    assert l.shape == r.shape == (2, 96, 96, 3)
    np.testing.assert_array_equal(l, frames[:, 2:98, :96])
    np.testing.assert_array_equal(r, frames[:, 2:98, 64:160])


def test_plots(rng, tmp_path):
    from oatx.visualization import plots

    frame = rng.integers(0, 255, (96, 128, 3)).astype(np.uint8)
    boxes = np.array([[0.1, 0.1, 0.5, 0.6, 0.4, 0.5]])
    out = plots.draw_bboxes(frame, boxes, ["dog"])
    assert out.shape == frame.shape
    assert not np.array_equal(out, frame)

    panel = plots.video_text_object_panel(
        [frame, frame, frame], "a dog runs", boxes, ["dog"])
    assert panel.shape == (96 + 28, 128 * 3, 3)

    emb = rng.standard_normal((30, 16))
    p = plots.tsne_embedding_plot(emb, labels=np.arange(30) % 3,
                                  out_path=str(tmp_path / "tsne.png"))
    assert os.path.exists(p)


def test_multi_stream_eval(tmp_path):
    from oatx.config.schema import ExperimentCfg
    from oatx.data.factory import build_dataset, build_loaders
    from oatx.data.loader import Collator, ShardedLoader
    from oatx.data.tokenizer import WordPieceTokenizer
    from oatx.eval.retrieval_eval import evaluate_streams
    from oatx.models import towers, distilbert as dbert, vit_spacetime as vst

    exp = ExperimentCfg.from_dict({
        "name": "ms", "arch": {"variant": "global_local", "args": {}},
        "data_loader": [{"type": "x", "args": {
            "dataset_name": "SyntheticVideoText",
            "data_dir": str(tmp_path / "v"), "object_dir": str(tmp_path / "o"),
            "batch_size": 8, "num_workers": 2, "split": "test",
            "video_params": {"input_res": 32, "num_frames": 2, "num_videos": 8,
                             "loading": "lax"}}}]})
    tok = WordPieceTokenizer.build_from_corpus(
        [f"scene {i} dog" for i in range(10)], vocab_size=256)
    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(img_size=32, patch_size=16, embed_dim=32,
                                     depth=1, num_heads=2, num_frames=2),
        text=dbert.DistilBertConfig(vocab_size=30522, max_position_embeddings=64,
                                    dim=32, hidden_dim=64, n_layers=1, n_heads=2),
        projection_dim=8, variant="global_local")
    params = towers.init(jax.random.PRNGKey(0), cfg)
    loaders = build_loaders(exp, tok, split="test")
    res = evaluate_streams(params, cfg, loaders[0])
    assert set(res) == {"st2sv", "lt2sv", "st2ov", "lt2ov"}
    for stream in res.values():
        assert "R1" in stream["t2v_metrics"]
