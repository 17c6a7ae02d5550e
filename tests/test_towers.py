"""Golden parity tests: oatx towers vs torch oracles (random weights, CPU)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oatx.models import convert, distilbert as dbert, vit_spacetime as vst

torch = pytest.importorskip("torch")


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


# --------------------------------------------------------------- DistilBERT

@pytest.fixture(scope="module")
def torch_distilbert():
    from transformers import DistilBertConfig, DistilBertModel

    torch.manual_seed(0)
    cfg = DistilBertConfig()  # default = distilbert-base-uncased shape
    model = DistilBertModel(cfg).eval()
    return model


def test_distilbert_parity(torch_distilbert):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 30522, (3, 17)).astype(np.int64)
    mask = np.ones((3, 17), np.int64)
    mask[1, 12:] = 0
    mask[2, 5:] = 0

    with torch.no_grad():
        want = torch_distilbert(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    sd = {k: v.numpy() for k, v in torch_distilbert.state_dict().items()}
    params = convert.distilbert_from_torch(sd)
    got = np.asarray(dbert.apply(params, dbert.DistilBertConfig(), jnp.array(ids), jnp.array(mask)))

    # masked positions diverge (torch computes them with garbage keys excluded
    # identically, so actually compare everything)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
    assert _cos(got[:, 0], want[:, 0]) > 0.9999


def test_distilbert_cls_embedding(torch_distilbert):
    sd = {k: v.numpy() for k, v in torch_distilbert.state_dict().items()}
    params = convert.distilbert_from_torch(sd)
    ids = jnp.array([[101, 2023, 2003, 1037, 3231, 102]])
    cls = dbert.cls_embedding(params, dbert.DistilBertConfig(), ids)
    assert cls.shape == (1, 768)


# ------------------------------------------------- SpaceTimeTransformer

@pytest.fixture(scope="module")
def ref_tower():
    from torch_oracles import load_reference_video_transformer

    mod = load_reference_video_transformer()
    if mod is None:
        pytest.skip("reference repo not available as oracle")
    torch.manual_seed(1)
    model = mod.SpaceTimeTransformer(num_frames=4, time_init="random", attention_style="frozen-in-time")
    # reference usage nulls the classifier head (model.py:44-45)
    model.head = torch.nn.Identity()
    model.pre_logits = torch.nn.Identity()
    model = model.eval()
    # randomize weights that matter (they are mostly zeros/trunc-normal already);
    # give temporal_embed real values so time paths are exercised
    with torch.no_grad():
        model.temporal_embed.normal_(0, 0.02)
    return model


@pytest.mark.parametrize("frames,split", [(1, False), (4, False), (4, True)])
def test_spacetime_parity(ref_tower, frames, split):
    # split=True runs the split-(patches, CLS)-stream path (PERF.md round 3)
    # DIRECTLY against the torch oracle, not just against the fused JAX path
    cfg = vst.SpaceTimeViTConfig(num_frames=4, time_init="random",
                                 split_cls_stream=split)
    sd = {k: v.numpy() for k, v in ref_tower.state_dict().items()}
    params = convert.spacetime_vit_overlay_torch(
        vst.init(jax.random.PRNGKey(0), cfg), sd, cfg
    )

    rng = np.random.default_rng(2)
    video = rng.standard_normal((2, frames, 224, 224, 3)).astype(np.float32)

    with torch.no_grad():
        t_cls, t_patches = ref_tower.forward_features(
            torch.from_numpy(video.transpose(0, 1, 4, 2, 3))  # NHWC → NCHW
        )
    out = vst.apply(params, cfg, jnp.array(video))
    got_cls, got_patches = np.asarray(out["cls"]), np.asarray(out["patches"])

    assert _cos(got_cls, t_cls.numpy()) > 0.999
    np.testing.assert_allclose(got_cls, t_cls.numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(got_patches, t_patches.numpy(), atol=5e-4, rtol=1e-3)


def test_zero_time_init_degenerates_to_vit():
    """With time_init='zeros' a fresh tower's time attention must be a no-op:
    its output adds exactly zero (qkv=0 ⇒ attn out = mean of zero v = 0,
    proj(0)=bias=0)."""
    cfg = vst.SpaceTimeViTConfig(num_frames=4, time_init="zeros", depth=2)
    params = vst.init(jax.random.PRNGKey(0), cfg)
    video = jnp.array(np.random.default_rng(0).standard_normal((1, 2, 224, 224, 3)), jnp.float32)
    out = vst.apply(params, cfg, video)
    # manually zero out timeattn contribution by comparing against a run where the
    # time branch params are perturbed — since qkv is zero either way, outputs match
    p2 = jax.tree_util.tree_map(lambda x: x, params)
    p2["blocks"]["timeattn"]["proj"]["kernel"] = (
        p2["blocks"]["timeattn"]["proj"]["kernel"] * 0.0 + 123.0
    )
    out2 = vst.apply(p2, cfg, video)
    np.testing.assert_allclose(np.asarray(out["cls"]), np.asarray(out2["cls"]), atol=1e-5)


def test_region_tap_layer():
    cfg = vst.SpaceTimeViTConfig(num_frames=2, depth=4, region_tap_layer=2)
    params = vst.init(jax.random.PRNGKey(0), cfg)
    video = jnp.array(np.random.default_rng(0).standard_normal((1, 2, 224, 224, 3)), jnp.float32)
    out = vst.apply(params, cfg, video)
    assert out["region"].shape == (1, 2 * 196, 768)
    assert out["patches"].shape == (1, 2 * 196, 768)


def test_global_local_pooling():
    cfg = vst.SpaceTimeViTConfig(num_frames=1, depth=2, pooling="cls_mean_half")
    params = vst.init(jax.random.PRNGKey(0), cfg)
    video = jnp.array(np.random.default_rng(0).standard_normal((1, 1, 224, 224, 3)), jnp.float32)
    out = vst.apply(params, cfg, video)
    cfg2 = vst.SpaceTimeViTConfig(num_frames=1, depth=2, pooling="cls")
    out2 = vst.apply(params, cfg2, video)
    want = 0.5 * np.asarray(out2["cls"]) + 0.5 * np.asarray(out2["patches"]).mean(axis=1)
    np.testing.assert_allclose(np.asarray(out["cls"]), want, atol=1e-5)


def test_inflate_temporal_embed_zeros_and_truncate():
    src = jnp.array(np.arange(2 * 3 * 4, dtype=np.float32).reshape(1, 6, 4))
    out = vst.inflate_temporal_embed(src, 8, "zeros")
    assert out.shape == (1, 8, 4)
    np.testing.assert_allclose(np.asarray(out[:, :6]), np.asarray(src))
    assert np.all(np.asarray(out[:, 6:]) == 0)
    out2 = vst.inflate_temporal_embed(src, 3, "zeros")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(src[:, :3]))


def test_variable_frames_share_weights():
    """F=1 and F=4 forwards must both work with the same params (joint image+video
    training: alternating CC3M/WebVid batches)."""
    cfg = vst.SpaceTimeViTConfig(num_frames=4, depth=2)
    params = vst.init(jax.random.PRNGKey(0), cfg)
    r = np.random.default_rng(0)
    out1 = vst.apply(params, cfg, jnp.array(r.standard_normal((2, 1, 224, 224, 3)), jnp.float32))
    out4 = vst.apply(params, cfg, jnp.array(r.standard_normal((2, 4, 224, 224, 3)), jnp.float32))
    assert out1["cls"].shape == out4["cls"].shape == (2, 768)


# ------------------------------------------- OA variant towers vs reference

def test_region_variant_parity():
    """Layer-6 region tap through a separate region_norm must match the
    reference oa_video_transformer_region.py:364-377 (K=6) numerically."""
    from torch_oracles import REFERENCE_OA_REGION, load_reference_module

    mod = load_reference_module(REFERENCE_OA_REGION, "ref_oa_region")
    if mod is None:
        pytest.skip("reference repo not available as oracle")
    torch.manual_seed(3)
    ref = mod.SpaceTimeTransformer(num_frames=4, time_init="random",
                                   attention_style="frozen-in-time")
    ref.head = torch.nn.Identity()
    ref.pre_logits = torch.nn.Identity()
    ref = ref.eval()
    with torch.no_grad():
        ref.temporal_embed.normal_(0, 0.02)
        ref.region_norm.weight.normal_(1, 0.2)
        ref.region_norm.bias.normal_(0, 0.1)

    cfg = vst.SpaceTimeViTConfig(num_frames=4, time_init="random",
                                 region_tap_layer=6)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert.spacetime_vit_overlay_torch(
        vst.init(jax.random.PRNGKey(0), cfg), sd, cfg)

    video = np.random.default_rng(5).standard_normal((2, 4, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        t_cls, t_region = ref.forward_features(
            torch.from_numpy(video.transpose(0, 1, 4, 2, 3)))
    out = vst.apply(params, cfg, jnp.array(video))

    assert _cos(np.asarray(out["cls"]), t_cls.numpy()) > 0.999
    np.testing.assert_allclose(np.asarray(out["cls"]), t_cls.numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["region"]), t_region.numpy(),
                               atol=5e-4, rtol=1e-3)


def test_global_local_variant_parity():
    """½·CLS + ½·mean(patches) pooling and last-layer region features must
    match the reference oa_video_transformer_global_local.py:356-359."""
    from torch_oracles import REFERENCE_OA_GLOBAL_LOCAL, load_reference_module

    mod = load_reference_module(REFERENCE_OA_GLOBAL_LOCAL, "ref_oa_gl")
    if mod is None:
        pytest.skip("reference repo not available as oracle")
    torch.manual_seed(4)
    ref = mod.SpaceTimeTransformer(num_frames=4, time_init="random",
                                   attention_style="frozen-in-time")
    ref.head = torch.nn.Identity()
    ref.pre_logits = torch.nn.Identity()
    ref = ref.eval()
    with torch.no_grad():
        ref.temporal_embed.normal_(0, 0.02)

    cfg = vst.SpaceTimeViTConfig(num_frames=4, time_init="random",
                                 pooling="cls_mean_half")
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert.spacetime_vit_overlay_torch(
        vst.init(jax.random.PRNGKey(0), cfg), sd, cfg)

    video = np.random.default_rng(6).standard_normal((2, 4, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        t_cls, t_region = ref.forward_features(
            torch.from_numpy(video.transpose(0, 1, 4, 2, 3)))
    out = vst.apply(params, cfg, jnp.array(video))

    assert _cos(np.asarray(out["cls"]), t_cls.numpy()) > 0.999
    np.testing.assert_allclose(np.asarray(out["cls"]), t_cls.numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["patches"]), t_region.numpy(),
                               atol=5e-4, rtol=1e-3)
