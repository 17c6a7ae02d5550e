"""Remat must be value-transparent: every remat_policy ('full' saves block
inputs only; 'dots' keeps non-batch matmul outputs; 'dots_all' keeps all
matmul outputs) recomputes the SAME forward and backward as the un-remat'd
tower — jax.checkpoint changes scheduling/memory, never math. Guards the
policy dispatch in vit_spacetime._remat_policy and the pod recipes that set
remat_policy (configs/pt/cc3m_webvid/vit_large_pod.json)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oatx.models import vit_spacetime as vst

POLICIES = ["full", "dots", "dots_all"]


def _cfg(remat: bool, policy: str = "full", **kw):
    return vst.SpaceTimeViTConfig(
        num_frames=2, img_size=32, patch_size=16, embed_dim=64, depth=3,
        num_heads=4, time_init="zeros", remat=remat,
        remat_policy=policy, **kw)


def _loss(params, cfg, video):
    out = vst.apply(params, cfg, video)
    return sum(jnp.sum(x * x) for x in jax.tree_util.tree_leaves(out))


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.standard_normal((2, 2, 32, 32, 3)), jnp.float32)
    params = vst.init(jax.random.PRNGKey(0), _cfg(False))
    return params, video


@pytest.mark.parametrize("policy", POLICIES)
def test_remat_policy_matches_no_remat(inputs, policy):
    params, video = inputs
    base_cfg = _cfg(False)
    cfg = _cfg(True, policy)

    base = jax.jit(lambda p: _loss(p, base_cfg, video))(params)
    val = jax.jit(lambda p: _loss(p, cfg, video))(params)
    np.testing.assert_allclose(np.asarray(val), np.asarray(base),
                               rtol=1e-6, atol=1e-6)

    g_base = jax.jit(jax.grad(lambda p: _loss(p, base_cfg, video)))(params)
    g = jax.jit(jax.grad(lambda p: _loss(p, cfg, video)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g_base)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_unknown_policy_rejected(inputs):
    params, video = inputs
    cfg = _cfg(True, "selective")  # not a supported policy
    with pytest.raises(AssertionError, match="remat_policy"):
        jax.grad(lambda p: _loss(p, cfg, video))(params)
