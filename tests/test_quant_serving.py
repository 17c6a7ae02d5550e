"""Weight-only int8 serving quantization (oatx.serve.quant).

Invariants: the int8 transform hits exactly the "kernel"-named matmul leaves
(per-layer, per-out-channel scales on stacked blocks), the element-wise error
is bounded by half a quantization step, quantized embeddings track the
full-precision ones (structure test — random-init weights, so a cosine floor,
never exact metric values), and the quantized artifact round-trips through
jax.export ~4x smaller. The reference has no quantization path (its eval is
full-precision torch; SURVEY.md §2) — these pin oatx-only semantics.
"""

import json

import numpy as np
import pytest

import jax

from oatx.models import distilbert as dbert, towers, vit_spacetime as vst
from oatx.serve.quant import (dequantize_tree, is_quantized_leaf,
                              quantization_report, quantize_array,
                              quantize_tree)

CANON, FRAMES, SEQ = 64, 2, 8
MIN_ELEMS = 256  # tiny test towers: quantize everything kernel-shaped


@pytest.fixture(scope="module")
def tiny_cfg_params():
    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(img_size=32, patch_size=16, embed_dim=32,
                                     depth=2, num_heads=2, num_frames=FRAMES),
        text=dbert.DistilBertConfig(vocab_size=64, max_position_embeddings=16,
                                    dim=32, hidden_dim=64, n_layers=1,
                                    n_heads=2),
        projection_dim=8,
    )
    return cfg, towers.init(jax.random.PRNGKey(0), cfg)


def _cos(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12
    return num / den


def test_quantize_array_error_bound():
    rng = np.random.default_rng(0)
    for shape in [(48, 64), (3, 48, 64), (4, 4, 3, 64)]:
        w = rng.standard_normal(shape).astype(np.float32) * 0.07
        node = quantize_array(w)
        assert node["q8"].dtype == np.int8
        deq = np.asarray(dequantize_tree(node))
        # symmetric rounding: |w - q*s| <= s/2 per element
        assert np.all(np.abs(w - deq) <= node["q8_scale"] / 2 + 1e-8)


def test_stacked_blocks_get_per_layer_scales():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((3, 16, 32)).astype(np.float32)
    w[1] *= 100.0  # one layer much larger: per-layer scales must isolate it
    node = quantize_array(w)
    assert node["q8_scale"].shape == (3, 1, 32)
    deq = np.asarray(dequantize_tree(node))
    rel = np.abs(w - deq).max(axis=(1, 2)) / np.abs(w).max(axis=(1, 2))
    assert rel.max() < 0.01  # layer 1's magnitude didn't wreck layers 0/2


def test_quantize_tree_targets_kernels_only(tiny_cfg_params):
    _, params = tiny_cfg_params
    q = quantize_tree(params, min_elems=MIN_ELEMS)

    def walk(orig, quant, path=""):
        if isinstance(orig, dict):
            assert set(orig) == set(quant), path
            for k in orig:
                walk(orig[k], quant[k], f"{path}/{k}")
            return
        leaf_name = path.rsplit("/", 1)[-1]
        if leaf_name == "kernel" and orig.size >= MIN_ELEMS:
            assert is_quantized_leaf(quant), path
            assert quant["q8"].shape == orig.shape, path
        else:
            assert quant is orig, path  # untouched, same array

    walk(params, q)
    rep = quantization_report(params, q)
    assert rep["quantized_kernels"] > 0
    assert rep["bytes_quantized"] < 0.5 * rep["bytes_full"]


def test_quantize_tree_refuses_empty_match(tiny_cfg_params):
    _, params = tiny_cfg_params
    with pytest.raises(ValueError):
        quantize_tree(params, min_elems=10**9)


def test_embed_service_quantized_tracks_full_precision(tiny_cfg_params):
    from oatx.serve.embed_service import EmbedService

    cfg, params = tiny_cfg_params
    full = EmbedService(params, cfg, buckets=(2,), seq_len=SEQ)
    q8 = EmbedService(params, cfg, buckets=(2,), seq_len=SEQ,
                      quantize="int8", quant_min_elems=MIN_ELEMS)
    rng = np.random.default_rng(2)
    v = rng.integers(0, 256, (2, FRAMES, CANON, CANON, 3)).astype(np.uint8)
    ids = rng.integers(1, 64, (2, SEQ)).astype(np.int32)
    mask = np.ones_like(ids)
    cv = _cos(full.embed_video(v), q8.embed_video(v))
    ct = _cos(full.embed_text(ids, mask), q8.embed_text(ids, mask))
    assert cv.min() > 0.98, cv
    assert ct.min() > 0.98, ct


def test_embed_service_rejects_unknown_mode(tiny_cfg_params):
    from oatx.serve.embed_service import EmbedService

    cfg, params = tiny_cfg_params
    with pytest.raises(ValueError):
        EmbedService(params, cfg, buckets=(1,), quantize="int4")


def test_quantized_artifact_roundtrip(tiny_cfg_params, tmp_path):
    from oatx.serve.export import ExportedEmbedder, save_artifact

    cfg, params = tiny_cfg_params
    full_dir = save_artifact(tmp_path / "full", params, cfg, frames=FRAMES,
                             canon=CANON, seq_len=SEQ)
    q_dir = save_artifact(tmp_path / "q8", params, cfg, frames=FRAMES,
                          canon=CANON, seq_len=SEQ, quantize="int8",
                          quant_min_elems=MIN_ELEMS)
    meta = json.loads((q_dir / "meta.json").read_text())
    assert meta["quantize"]["mode"] == "int8"
    assert meta["quantize"]["quantized_kernels"] > 0
    # the params payload shrinks (tiny towers are embedding-heavy, so assert
    # the kernel-byte win, not the full 4x a real model sees)
    full_bytes = (full_dir / "params.npz").stat().st_size
    q_bytes = (q_dir / "params.npz").stat().st_size
    assert q_bytes < full_bytes

    full_emb = ExportedEmbedder(full_dir)
    q_emb = ExportedEmbedder(q_dir)
    rng = np.random.default_rng(3)
    for b in (1, 3):  # symbolic batch dim serves any size
        v = rng.integers(0, 256, (b, FRAMES, CANON, CANON, 3)).astype(np.uint8)
        cv = _cos(full_emb.embed_video(v), q_emb.embed_video(v))
        assert cv.min() > 0.98, cv
    ids = rng.integers(1, 64, (2, SEQ)).astype(np.int32)
    ct = _cos(full_emb.embed_text(ids, np.ones_like(ids)),
              q_emb.embed_text(ids, np.ones_like(ids)))
    assert ct.min() > 0.98, ct
