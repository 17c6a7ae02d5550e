"""Golden tests: first-party CLIP vision transformer vs the reference's
vendored CLIP visual side (Visualization/.../clip/model.py:203-243), imported
as a random-init torch oracle — reference code is never copied."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from oatx.models import clip_vision as cv  # noqa: E402
from oatx.models import convert  # noqa: E402

from tests.test_clip_text import TINY, _load_ref  # noqa: E402


@pytest.fixture(scope="module")
def torch_clip():
    torch = pytest.importorskip("torch")
    mod = _load_ref("model.py", "ref_clip_model_vision")
    torch.manual_seed(0)
    model = mod.CLIP(**TINY).float().eval()
    return torch, model


def _rand_imgs(rng, b, res):
    return np.asarray(rng.standard_normal((b, res, res, 3)), np.float32)


def test_config_inference(torch_clip):
    torch, model = torch_clip
    params, cfg = convert.clip_vision_from_torch(
        {k: v.numpy() for k, v in model.state_dict().items()})
    assert cfg.width == TINY["vision_width"]
    assert cfg.layers == TINY["vision_layers"]
    assert cfg.patch_size == TINY["vision_patch_size"]
    assert cfg.input_resolution == TINY["image_resolution"]
    assert cfg.output_dim == TINY["embed_dim"]


def test_encode_image_patches_golden(torch_clip):
    """Our per-patch variant vs the vendored visual forward (model.py:222-242:
    ln_post over ALL patch tokens @ proj, L2-normalized) — the embedding the
    viz drivers consume (main_img.py:28)."""
    torch, model = torch_clip
    params, cfg = convert.clip_vision_from_torch(
        {k: v.numpy() for k, v in model.state_dict().items()})
    rng = np.random.default_rng(0)
    imgs = _rand_imgs(rng, 3, TINY["image_resolution"])
    with torch.no_grad():
        ref = model.visual(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(cv.encode_image_patches(params, cfg, jnp.asarray(imgs)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_encode_image_stock_pooling_golden(torch_clip):
    """Stock CLIP pooling (ln_post(CLS) @ proj — the behavior the vendored
    copy comments out, model.py:234-238) vs the oracle composed from its own
    submodules."""
    torch, model = torch_clip
    params, cfg = convert.clip_vision_from_torch(
        {k: v.numpy() for k, v in model.state_dict().items()})
    rng = np.random.default_rng(1)
    imgs = _rand_imgs(rng, 2, TINY["image_resolution"])
    vis = model.visual
    with torch.no_grad():
        x = vis.conv1(torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = vis.class_embedding + torch.zeros(
            x.shape[0], 1, x.shape[-1], dtype=x.dtype)
        x = torch.cat([cls, x], dim=1) + vis.positional_embedding
        x = vis.ln_pre(x).permute(1, 0, 2)
        x = vis.transformer(x).permute(1, 0, 2)
        ref = (vis.ln_post(x[:, 0, :]) @ vis.proj).numpy()
    ours = np.asarray(cv.encode_image(params, cfg, jnp.asarray(imgs)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)
    cos = np.sum(ours * ref, -1) / (
        np.linalg.norm(ours, axis=-1) * np.linalg.norm(ref, axis=-1))
    assert np.all(cos > 0.9999)


def test_export_roundtrip(torch_clip):
    """clip_vision_to_torch ↔ clip_vision_from_torch round-trip, and a
    zero-missing-key visual-side load into the vendored CLIP module."""
    torch, model = torch_clip
    params, cfg = convert.clip_vision_from_torch(
        {k: v.numpy() for k, v in model.state_dict().items()})
    sd = convert.clip_vision_to_torch(params)
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False)
    assert unexpected == []
    assert [k for k in missing if k.startswith("visual.")] == []

    back, cfg2 = convert.clip_vision_from_torch(sd)
    assert cfg2 == cfg
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(_rand_imgs(rng, 2, TINY["image_resolution"]))
    a = np.asarray(cv.encode_image_patches(params, cfg, imgs))
    b = np.asarray(cv.encode_image_patches(back, cfg2, imgs))
    np.testing.assert_array_equal(a, b)


def test_scan_layers_matches_unrolled(torch_clip):
    torch, model = torch_clip
    params, cfg = convert.clip_vision_from_torch(
        {k: v.numpy() for k, v in model.state_dict().items()})
    import dataclasses

    cfg_scan = dataclasses.replace(cfg, scan_layers=True)
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(_rand_imgs(rng, 2, TINY["image_resolution"]))
    a = np.asarray(cv.encode_image(params, cfg, imgs))
    b = np.asarray(cv.encode_image(params, cfg_scan, imgs))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_init_shapes():
    cfg = cv.ClipVisionConfig(input_resolution=32, patch_size=16, width=64,
                              heads=2, layers=2, output_dim=48)
    params = cv.init(jax.random.PRNGKey(0), cfg)
    assert params["conv1"]["kernel"].shape == (16, 16, 3, 64)
    assert "bias" not in params["conv1"]  # conv1 has no bias (model.py:208)
    assert params["positional_embedding"].shape == (5, 64)
    assert params["proj"].shape == (64, 48)
    imgs = jnp.zeros((2, 32, 32, 3))
    assert cv.encode_image(params, cfg, imgs).shape == (2, 48)
    assert cv.encode_image_patches(params, cfg, imgs).shape == (2, 4, 48)
