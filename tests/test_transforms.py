import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oatx.data import transforms as T

torch = pytest.importorskip("torch")


def test_eval_transform_matches_torchvision_chain(rng):
    """Golden: short-side-256 + center-crop-256 (host) → bilinear 224 + normalize
    (device) must match torch's functional chain on the same canonical input."""
    import torch.nn.functional as F

    u8 = rng.integers(0, 256, (2, 1, 256, 256, 3)).astype(np.uint8)
    got = np.asarray(T.eval_transform(jnp.array(u8)))

    x = torch.from_numpy(u8.astype(np.float32) / 255.0).permute(0, 1, 4, 2, 3)
    x = x.reshape(2, 3, 256, 256)
    x = F.interpolate(x, size=(224, 224), mode="bilinear", align_corners=False)
    mean = torch.tensor(T.IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(T.IMAGENET_STD).view(1, 3, 1, 1)
    want = ((x - mean) / std).reshape(2, 1, 3, 224, 224).permute(0, 1, 3, 4, 2).numpy()

    np.testing.assert_allclose(got, want, atol=2e-5)


def test_center_crop_and_resize_shapes(rng):
    x = jnp.array(rng.standard_normal((1, 2, 300, 260, 3)), jnp.float32)
    c = T.center_crop(x, 256)
    assert c.shape == (1, 2, 256, 256, 3)
    r = T.resize_bilinear(c, 224, 224)
    assert r.shape == (1, 2, 224, 224, 3)


def test_train_augment_properties(rng):
    u8 = rng.integers(0, 256, (4, 2, 256, 256, 3)).astype(np.uint8)
    out = T.train_augment(jax.random.PRNGKey(0), jnp.array(u8))
    assert out.shape == (4, 2, 224, 224, 3)
    assert np.isfinite(np.asarray(out)).all()
    # different key → different augmentation
    out2 = T.train_augment(jax.random.PRNGKey(1), jnp.array(u8))
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    # same key → identical (determinism)
    out3 = T.train_augment(jax.random.PRNGKey(0), jnp.array(u8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out3), atol=1e-6)


def test_crop_is_temporally_consistent(rng):
    """Same crop/flip across frames of a clip (torchvision per-tensor semantics)."""
    frame = rng.integers(0, 256, (1, 1, 256, 256, 3)).astype(np.uint8)
    clip = np.repeat(frame, 3, axis=1)  # identical frames
    out = np.asarray(T.train_augment(jax.random.PRNGKey(2), jnp.array(clip)))
    np.testing.assert_allclose(out[:, 0], out[:, 1], atol=1e-5)
    np.testing.assert_allclose(out[:, 0], out[:, 2], atol=1e-5)


def test_random_resized_crop_zoom_bounds(rng):
    """Crop area must stay within [0.5, 1.0]·source area: check that a constant
    image stays constant and a gradient keeps its range."""
    grad = np.tile(np.linspace(0, 1, 256, dtype=np.float32)[None, :, None], (256, 1, 3))
    video = jnp.array(grad[None, None])
    cfg = T.TransformConfig()
    out = np.asarray(T.random_resized_crop(jax.random.PRNGKey(3), video, cfg))
    assert out.shape == (1, 1, 224, 224, 3)
    assert out.min() >= -1e-4 and out.max() <= 1 + 1e-4


def test_hflip_flips(rng):
    video = jnp.array(rng.standard_normal((8, 1, 4, 4, 3)), jnp.float32)
    out = np.asarray(T.random_hflip(jax.random.PRNGKey(0), video))
    flipped = np.asarray(video[..., ::-1, :])
    orig = np.asarray(video)
    for i in range(8):
        assert np.allclose(out[i], orig[i]) or np.allclose(out[i], flipped[i])
    # with 8 clips, overwhelmingly likely both cases occur
    flips = [np.allclose(out[i], flipped[i]) and not np.allclose(out[i], orig[i]) for i in range(8)]
    assert any(flips) and not all(flips)


def test_color_jitter_noop_at_zero(rng):
    video = jnp.array(rng.uniform(size=(2, 1, 8, 8, 3)), jnp.float32)
    out = T.color_jitter(jax.random.PRNGKey(0), video, T.TransformConfig())
    np.testing.assert_array_equal(np.asarray(out), np.asarray(video))


def test_color_jitter_active():
    video = jnp.full((2, 1, 8, 8, 3), 0.5, jnp.float32)
    cfg = T.TransformConfig(color_jitter=(0.4, 0.4, 0.1))
    out = np.asarray(T.color_jitter(jax.random.PRNGKey(1), video, cfg))
    assert out.shape == video.shape
    assert not np.allclose(out, np.asarray(video))
    assert out.min() >= 0 and out.max() <= 1


def test_host_canonicalize(rng):
    frames = rng.integers(0, 255, (2, 300, 256, 3)).astype(np.uint8)
    out = T.host_canonicalize(frames, 256)
    assert out.shape == (2, 256, 256, 3)
    np.testing.assert_array_equal(out, frames[:, 22:278])


# ---------------------------------------------- host-faithful reference RRC

def test_tv_rrc_params_algorithm_properties():
    """tv_random_resized_crop_params reproduces torchvision
    RandomResizedCrop.get_params: boxes always fit, areas within the scale
    bounds (up to integer rounding), aspect within the ratio bounds, and
    positions cover the frame (not pinned to the canonical center square —
    the whole point of the ablation lane)."""
    g = np.random.default_rng(0)
    H, W = 240, 320
    scale, ratio = (0.5, 1.0), (3 / 4, 4 / 3)
    tops, lefts, areas, aspects = [], [], [], []
    for _ in range(3000):
        top, left, h, w = T.tv_random_resized_crop_params(g, H, W, scale, ratio)
        assert 0 <= top and top + h <= H and 0 <= left and left + w <= W
        assert h > 0 and w > 0
        tops.append(top); lefts.append(left)
        areas.append(h * w / (H * W)); aspects.append(w / h)
    areas, aspects = np.asarray(areas), np.asarray(aspects)
    # rounding of sqrt(area) perturbs the box by <= 1 px per side
    assert areas.min() >= scale[0] * 0.93 and areas.max() <= scale[1] * 1.07
    assert aspects.min() >= ratio[0] * 0.93 and aspects.max() <= ratio[1] * 1.07
    # area ~ U(0.5, 1.0) BEFORE rejection; at 320x240 portrait-aspect boxes
    # with area fraction ≳ 0.56·(4/3)/aspect exceed H and get resampled, so
    # the accepted-area mean sits below 0.75 (torchvision behaves the same —
    # its get_params resamples up to 10 times under the identical predicate)
    assert 0.62 < areas.mean() < 0.72
    # crops reach the full frame: some boxes start beyond the canonical
    # center square's left edge ((W - H) // 2 = 40 at 320x240)
    assert min(lefts) < 10 and max(lefts) > 60


def test_tv_rrc_fallback_matches_torchvision_formula():
    """Extreme aspect frames exhaust the 10 attempts; the fallback must be
    torchvision's exact deterministic ratio-clamped center crop."""
    g = np.random.default_rng(1)
    # 1000x50 frame (in_ratio 20 > 4/3): w = round(50 * 4/3) = 67, h = 50
    top, left, h, w = T.tv_random_resized_crop_params(
        g, 50, 1000, (0.99, 1.0), (3 / 4, 4 / 3))
    assert (top, left, h, w) == (0, (1000 - 67) // 2, 50, 67)
    # 50x1000 portrait (in_ratio 0.05 < 3/4): w = 50, h = round(50 / (3/4)) = 67
    top, left, h, w = T.tv_random_resized_crop_params(
        g, 1000, 50, (0.99, 1.0), (3 / 4, 4 / 3))
    assert (top, left, h, w) == ((1000 - 67) // 2, 0, 67, 50)


def test_host_reference_rrc_shapes_and_determinism():
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, (4, 240, 320, 3)).astype(np.uint8)
    out1 = T.host_reference_rrc(frames, np.random.default_rng(7), out=224)
    out2 = T.host_reference_rrc(frames, np.random.default_rng(7), out=224)
    assert out1.shape == (4, 224, 224, 3) and out1.dtype == np.uint8
    np.testing.assert_array_equal(out1, out2)  # seeded determinism
    # one box per clip: a flat-color frame stays flat after crop+resize
    flat = np.full((2, 120, 160, 3), 77, np.uint8)
    outf = T.host_reference_rrc(flat, np.random.default_rng(3), out=64)
    assert int(outf.min()) == 77 and int(outf.max()) == 77


def test_np_bilinear_matches_device_resize():
    """Host _np_bilinear_resize must sample identically to the device
    resize_bilinear (same half-pixel, no-antialias convention) so the
    precropped lane's pixels match what the device chain would produce."""
    rng = np.random.default_rng(4)
    img = rng.standard_normal((3, 37, 53, 3)).astype(np.float32)
    a = T._np_bilinear_resize(img, 224, 224)
    b = np.asarray(T.resize_bilinear(jnp.asarray(img), 224, 224))
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_train_augment_host_precropped_skips_crop(rng):
    cfg = T.TransformConfig(input_res=32, host_precropped=True,
                            color_jitter=(0, 0, 0))
    vid = jnp.asarray(rng.integers(0, 255, (2, 2, 32, 32, 3)), jnp.uint8)
    out = T.train_augment(jax.random.PRNGKey(0), vid, cfg)
    assert out.shape == (2, 2, 32, 32, 3)
    # no crop/resize: up to flip, values must be exactly normalize(x/255)
    ref = T.normalize(vid.astype(jnp.float32) / 255.0, cfg)
    ok_direct = np.allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    ok_flip = np.allclose(np.asarray(out), np.asarray(ref[..., ::-1, :]), atol=1e-6)
    per_clip = []
    for i in range(2):
        per_clip.append(
            np.allclose(np.asarray(out[i]), np.asarray(ref[i]), atol=1e-6)
            or np.allclose(np.asarray(out[i]), np.asarray(ref[i, :, :, ::-1, :]),
                           atol=1e-6))
    assert all(per_clip), (ok_direct, ok_flip)
