"""Fused LN→Linear kernel: numerics vs the unfused layers.py path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oatx.ops import layers
from oatx.ops.pallas import ln_linear as ll


@pytest.fixture
def problem():
    rng = np.random.default_rng(7)
    R, K, N = 300, 128, 384  # R deliberately NOT a multiple of the row tile
    x = rng.standard_normal((R, K)).astype(np.float32)
    gamma = (1 + 0.1 * rng.standard_normal(K)).astype(np.float32)
    beta = (0.1 * rng.standard_normal(K)).astype(np.float32)
    w = (rng.standard_normal((K, N)) / np.sqrt(K)).astype(np.float32)
    b = (0.1 * rng.standard_normal(N)).astype(np.float32)
    return x, gamma, beta, w, b


def _unfused(x, gamma, beta, w, b, eps=1e-6):
    return layers.linear({"kernel": w, "bias": b},
                         layers.layer_norm({"scale": gamma, "bias": beta}, x, eps))


def test_xla_fallback_matches_unfused(problem):
    x, gamma, beta, w, b = problem
    got = ll._fwd_xla(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
                      jnp.asarray(w), jnp.asarray(b), 1e-6)
    want = _unfused(x, gamma, beta, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_pallas_interpret_matches_unfused(problem):
    x, gamma, beta, w, b = problem
    got = ll._fwd_pallas(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
                         jnp.asarray(w), jnp.asarray(b), 1e-6, row_tile=128,
                         interpret=True)
    want = _unfused(x, gamma, beta, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_public_api_shapes_and_values(problem):
    x, gamma, beta, w, b = problem
    x3 = x.reshape(10, 30, -1)  # leading dims flattened internally
    got = ll.ln_linear({"scale": gamma, "bias": beta}, {"kernel": w, "bias": b},
                       jnp.asarray(x3))
    want = _unfused(x3, gamma, beta, w, b)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_custom_vjp_matches_autodiff(problem):
    x, gamma, beta, w, b = problem
    cot = np.asarray(
        np.sin(np.arange(x.shape[0] * w.shape[1])).reshape(x.shape[0], w.shape[1]),
        np.float32)

    def fused_loss(x, gamma, beta, w, b):
        y = ll._ln_linear2d(jnp.asarray(x), gamma, beta, w, b, 1e-6)
        return jnp.sum(y * cot)

    def unfused_loss(x, gamma, beta, w, b):
        return jnp.sum(_unfused(x, gamma, beta, w, b) * cot)

    got = jax.grad(fused_loss, argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
        jnp.asarray(w), jnp.asarray(b))
    want = jax.grad(unfused_loss, argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
        jnp.asarray(w), jnp.asarray(b))
    for g, wgt, name in zip(got, want, ("dx", "dgamma", "dbeta", "dw", "db")):
        assert g.shape == wgt.shape, name
        np.testing.assert_allclose(np.asarray(g), np.asarray(wgt),
                                   atol=2e-4, rtol=1e-4, err_msg=name)


def test_bf16_path_close_to_f32(problem):
    x, gamma, beta, w, b = problem
    got = ll._fwd_xla(jnp.asarray(x, jnp.bfloat16), jnp.asarray(gamma),
                      jnp.asarray(beta), jnp.asarray(w, jnp.bfloat16),
                      jnp.asarray(b), 1e-6)
    want = _unfused(x, gamma, beta, w, b)
    cos = np.sum(np.asarray(got, np.float64) * np.asarray(want, np.float64)) / (
        np.linalg.norm(np.asarray(got, np.float64))
        * np.linalg.norm(np.asarray(want, np.float64)))
    assert cos > 0.999


# ------------------------------------------------------------- fused LN→MLP

from oatx.ops.pallas import ln_mlp as lm


def _unfused_mlp(x, gamma, beta, w1, b1, w2, b2, eps=1e-6):
    z = layers.layer_norm({"scale": gamma, "bias": beta}, x, eps)
    return layers.mlp({"fc1": {"kernel": w1, "bias": b1},
                       "fc2": {"kernel": w2, "bias": b2}}, z)


@pytest.fixture
def mlp_problem():
    rng = np.random.default_rng(11)
    R, K, H = 300, 128, 512
    x = rng.standard_normal((R, K)).astype(np.float32)
    gamma = (1 + 0.1 * rng.standard_normal(K)).astype(np.float32)
    beta = (0.1 * rng.standard_normal(K)).astype(np.float32)
    w1 = (rng.standard_normal((K, H)) / np.sqrt(K)).astype(np.float32)
    b1 = (0.1 * rng.standard_normal(H)).astype(np.float32)
    w2 = (rng.standard_normal((H, K)) / np.sqrt(H)).astype(np.float32)
    b2 = (0.1 * rng.standard_normal(K)).astype(np.float32)
    return x, gamma, beta, w1, b1, w2, b2


def test_mlp_xla_fallback_matches_unfused(mlp_problem):
    args = [jnp.asarray(a) for a in mlp_problem]
    got = lm._fwd_xla(*args, 1e-6)
    want = _unfused_mlp(*mlp_problem)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_mlp_pallas_interpret_matches_unfused(mlp_problem):
    args = [jnp.asarray(a) for a in mlp_problem]
    got = lm._fwd_pallas(*args, 1e-6, row_tile=128, interpret=True)
    want = _unfused_mlp(*mlp_problem)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_mlp_public_api(mlp_problem):
    x, gamma, beta, w1, b1, w2, b2 = mlp_problem
    x3 = x.reshape(4, 75, -1)
    got = lm.ln_mlp({"scale": gamma, "bias": beta},
                    {"fc1": {"kernel": w1, "bias": b1},
                     "fc2": {"kernel": w2, "bias": b2}}, jnp.asarray(x3))
    want = _unfused_mlp(x3, gamma, beta, w1, b1, w2, b2)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_mlp_custom_vjp_matches_autodiff(mlp_problem):
    x = mlp_problem[0]
    cot = np.asarray(
        np.cos(np.arange(x.shape[0] * x.shape[1])).reshape(x.shape), np.float32)
    args = tuple(jnp.asarray(a) for a in mlp_problem)

    def fused_loss(*a):
        return jnp.sum(lm._ln_mlp2d(*a, 1e-6) * cot)

    def unfused_loss(*a):
        return jnp.sum(_unfused_mlp(*a) * cot)

    got = jax.grad(fused_loss, argnums=tuple(range(7)))(*args)
    want = jax.grad(unfused_loss, argnums=tuple(range(7)))(*args)
    names = ("dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2")
    for g, wgt, name in zip(got, want, names):
        assert g.shape == wgt.shape, name
        np.testing.assert_allclose(np.asarray(g), np.asarray(wgt),
                                   atol=3e-4, rtol=2e-4, err_msg=name)


def test_vit_block_fused_flag_forward_identical():
    """fused_mlp=True with the XLA fallback (CPU) must match the unfused
    block's forward (to f32 op-reorder noise — bias adds in f32 vs compute
    dtype) and gradients."""
    from oatx.models import vit_spacetime as vst

    rng = np.random.default_rng(5)
    mk = lambda fused: vst.SpaceTimeViTConfig(
        img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=4,
        num_frames=2, time_init="random", fused_mlp=fused)
    params = vst.init(jax.random.PRNGKey(1), mk(True))
    video = jnp.asarray(rng.standard_normal((2, 2, 32, 32, 3)), jnp.float32)

    out_f = vst.apply(params, mk(True), video)
    out_u = vst.apply(params, mk(False), video)
    np.testing.assert_allclose(np.asarray(out_f["cls"]), np.asarray(out_u["cls"]),
                               atol=1e-5, rtol=1e-5)

    def loss(p, fused):
        return jnp.sum(vst.apply(p, mk(fused), video)["cls"] ** 2)

    g_f = jax.grad(loss)(params, True)
    g_u = jax.grad(loss)(params, False)
    flat_f = jax.tree_util.tree_leaves(g_f)
    flat_u = jax.tree_util.tree_leaves(g_u)
    for a, b in zip(flat_f, flat_u):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_vit_block_fused_qkv_flag_matches_unfused():
    """fused_qkv=True (LN inside the attention qkv custom-VJP op) must match
    the unfused block's forward and gradients on CPU."""
    from oatx.models import vit_spacetime as vst

    rng = np.random.default_rng(9)
    mk = lambda fused: vst.SpaceTimeViTConfig(
        img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=4,
        num_frames=2, time_init="random", fused_qkv=fused, fused_mlp=False)
    params = vst.init(jax.random.PRNGKey(2), mk(True))
    video = jnp.asarray(rng.standard_normal((2, 2, 32, 32, 3)), jnp.float32)

    out_f = vst.apply(params, mk(True), video)
    out_u = vst.apply(params, mk(False), video)
    np.testing.assert_allclose(np.asarray(out_f["cls"]), np.asarray(out_u["cls"]),
                               atol=1e-5, rtol=1e-5)

    def loss(p, fused):
        return jnp.sum(vst.apply(p, mk(fused), video)["cls"] ** 2)

    g_f = jax.grad(loss)(params, True)
    g_u = jax.grad(loss)(params, False)
    for a, b in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)
