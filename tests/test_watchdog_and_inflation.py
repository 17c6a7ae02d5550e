import logging
import time

import numpy as np
import pytest

import jax.numpy as jnp


def test_watchdog_warns_on_stall(caplog):
    from oatx.utils.watchdog import StepWatchdog

    logger = logging.getLogger("test.watchdog")
    with caplog.at_level(logging.WARNING, logger="test.watchdog"):
        with StepWatchdog(timeout_s=0.2, logger=logger, dump_stacks=True) as wd:
            wd.beat()
            time.sleep(1.0)  # stall > timeout
        assert any("possible hang" in r.message for r in caplog.records)
        assert any("thread" in r.message for r in caplog.records)  # stack dump


def test_watchdog_quiet_when_beating(caplog):
    from oatx.utils.watchdog import StepWatchdog

    logger = logging.getLogger("test.watchdog2")
    with caplog.at_level(logging.WARNING, logger="test.watchdog2"):
        with StepWatchdog(timeout_s=0.6, logger=logger) as wd:
            for _ in range(6):
                time.sleep(0.1)
                wd.beat()
    assert not caplog.records


def test_spatial_embed_inflation():
    from oatx.models.vit_spacetime import inflate_spatial_embed

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((1, 197, 8)), jnp.float32)  # 14x14 + CLS
    out = inflate_spatial_embed(pos, 49)  # → 7x7
    assert out.shape == (1, 50, 8)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(pos[:, 0]))  # CLS kept
    # round trip at same size is identity
    same = inflate_spatial_embed(pos, 196)
    np.testing.assert_allclose(np.asarray(same), np.asarray(pos))


def test_spatial_inflation_through_import():
    """A 224² (14×14) torch pos_embed imports into a 112² (7×7) model."""
    from oatx.models import convert, vit_spacetime as vst
    import jax

    rng = np.random.default_rng(1)
    sd = {"pos_embed": rng.standard_normal((1, 197, 32)).astype(np.float32)}
    cfg = vst.SpaceTimeViTConfig(img_size=112, patch_size=16, embed_dim=32,
                                 depth=1, num_heads=2, num_frames=1)
    fresh = vst.init(jax.random.PRNGKey(0), cfg)
    out = convert.spacetime_vit_overlay_torch(fresh, sd, cfg)
    assert out["pos_embed"].shape == (1, 50, 32)
