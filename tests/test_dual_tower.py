import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oatx.models import towers
from oatx.models import vit_spacetime as vst
from oatx.models import distilbert as dbert


def _tiny_cfg(variant="baseline", frames=2):
    return towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(
            img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=4,
            num_frames=frames,
        ),
        text=dbert.DistilBertConfig(
            vocab_size=100, max_position_embeddings=32, dim=64, hidden_dim=128,
            n_layers=2, n_heads=4,
        ),
        projection_dim=16,
        variant=variant,
    )


def test_baseline_forward_shapes(rng):
    cfg = _tiny_cfg()
    params = towers.init(jax.random.PRNGKey(0), cfg)
    batch = {
        "video": jnp.array(rng.standard_normal((3, 2, 32, 32, 3)), jnp.float32),
        "input_ids": jnp.array(rng.integers(0, 100, (3, 7))),
        "attention_mask": jnp.ones((3, 7), jnp.int32),
    }
    t, v = towers.forward(params, cfg, batch)
    assert t.shape == (3, 16) and v.shape == (3, 16)
    assert np.isfinite(np.asarray(t)).all() and np.isfinite(np.asarray(v)).all()


def test_tag_token_masks_matches_reference_loop(rng):
    """Golden vs a literal numpy transcription of the reference double loop
    (oa_model_global_local.py:189-196)."""
    B, O, L = 4, 5, 24
    text_lens = rng.integers(3, 10, B)
    # cumulative end offsets per object (each tag 1-3 tokens)
    lens = rng.integers(1, 4, (B, O))
    ends = np.cumsum(lens, axis=1)

    def reference(text_lens, ends):
        masks = np.zeros((B, O, L), np.float32)
        for j in range(B):
            start = 0
            for k in range(O):
                lo = text_lens[j] - 1 + start
                hi = text_lens[j] - 1 + int(ends[j][k])
                masks[j][k][lo:hi] = 1
                start = int(ends[j][k])
        return masks

    got = np.asarray(towers.tag_token_masks(jnp.array(text_lens), jnp.array(ends), L))
    np.testing.assert_array_equal(got, reference(text_lens, ends))


def test_global_local_forward(rng):
    cfg = _tiny_cfg("global_local")
    params = towers.init(jax.random.PRNGKey(0), cfg)
    B, O, F = 2, 4, 2
    N = 4  # 32/16 = 2 → 4 patches per frame
    batch = {
        "video": jnp.array(rng.standard_normal((B, F, 32, 32, 3)), jnp.float32),
        "object_frame": jnp.array(rng.standard_normal((B, 1, 32, 32, 3)), jnp.float32),
        "input_ids": jnp.array(rng.integers(0, 100, (B, 8))),
        "attention_mask": jnp.ones((B, 8), jnp.int32),
        "pad_input_ids": jnp.array(rng.integers(0, 100, (B, 16))),
        "pad_attention_mask": jnp.ones((B, 16), jnp.int32),
        "patch_masks": jnp.array(rng.uniform(size=(B, O, N)) > 0.5, jnp.float32),
        "object_token_masks": jnp.array(np.cumsum(rng.integers(1, 3, (B, O)), axis=1)),
    }
    out = towers.forward(params, cfg, batch)
    assert out["text_embeds"].shape == (B, 16)
    assert out["pad_text_embeds"].shape == (B, 16)
    assert out["video_embeds"].shape == (B, 16)
    assert out["object_img_embeds"].shape == (B, 16)
    assert out["region_feat"].shape == (B, O, 16)
    assert out["tags_feat"].shape == (B, O, 16)
    # global-local pooling engaged automatically
    assert cfg.video.pooling == "cls_mean_half"


def test_region_mem_forward(rng):
    cfg = _tiny_cfg("region_mem")
    assert cfg.video.region_tap_layer == 6 or cfg.video.region_tap_layer is not None
    # depth=2 < 6 → override tap to 1 for the tiny model
    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(
            img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=4,
            num_frames=2, region_tap_layer=1,
        ),
        text=cfg.text, projection_dim=16, variant="region_mem",
    )
    params = towers.init(jax.random.PRNGKey(0), cfg)
    B, K, F, N = 2, 5, 2, 4
    batch = {
        "video": jnp.array(rng.standard_normal((B, F, 32, 32, 3)), jnp.float32),
        "object_frame": jnp.array(rng.standard_normal((B, 1, 32, 32, 3)), jnp.float32),
        "input_ids": jnp.array(rng.integers(0, 100, (B, 8))),
        "attention_mask": jnp.ones((B, 8), jnp.int32),
        "text_region_embedding": jnp.array(rng.standard_normal((B, K, 512)), jnp.float32),
    }
    out = towers.forward(params, cfg, batch)
    assert out["text_embeds"].shape == (B, 16)
    assert out["video_embeds"].shape == (B, 16)
    assert out["region_sim_logits"].shape == (B, K, N)


def test_forward_jits(rng):
    cfg = _tiny_cfg()
    params = towers.init(jax.random.PRNGKey(0), cfg)
    batch = {
        "video": jnp.array(rng.standard_normal((2, 2, 32, 32, 3)), jnp.float32),
        "input_ids": jnp.array(rng.integers(0, 100, (2, 7))),
        "attention_mask": jnp.ones((2, 7), jnp.int32),
    }
    f = jax.jit(lambda p, b: towers.forward(p, cfg, b))
    t, v = f(params, batch)
    t2, v2 = towers.forward(params, cfg, batch)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v2), atol=1e-5)


def test_chunked_eval_step_matches_unchunked(rng):
    """make_eval_step(chunk=N) scans bs-N sub-batches inside one jit (the
    large-batch eval layout fix, PERF.md round 3) — outputs must equal the
    plain step on the same batch, and batches <= chunk must skip the scan."""
    from oatx.train import step as steplib

    cfg = _tiny_cfg()
    params = towers.init(jax.random.PRNGKey(0), cfg)
    batch = {
        "video": jnp.array(
            rng.integers(0, 255, (16, 2, 48, 48, 3)), jnp.uint8),
        "input_ids": jnp.array(rng.integers(0, 100, (16, 7))),
        "attention_mask": jnp.ones((16, 7), jnp.int32),
    }
    plain = steplib.make_eval_step(cfg)(params, batch)
    chunked = steplib.make_eval_step(cfg, chunk=4)(params, batch)
    assert set(plain) == set(chunked)
    for k in plain:
        np.testing.assert_allclose(
            np.asarray(plain[k]), np.asarray(chunked[k]), rtol=2e-5, atol=2e-5)

    # batch == chunk: the unscanned path, still identical
    small = {k: v[:4] for k, v in batch.items()}
    s_plain = steplib.make_eval_step(cfg)(params, small)
    s_chunk = steplib.make_eval_step(cfg, chunk=4)(params, small)
    for k in s_plain:
        np.testing.assert_allclose(
            np.asarray(s_plain[k]), np.asarray(s_chunk[k]), rtol=2e-5, atol=2e-5)

    # indivisible batch: loud error, not silent mis-grouping
    bad = {k: v[:6] for k, v in batch.items()}
    with pytest.raises(ValueError, match="divisible"):
        steplib.make_eval_step(cfg, chunk=4)(params, bad)
