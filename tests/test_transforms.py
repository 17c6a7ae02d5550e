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
