"""Parity of the split-(patches, CLS)-stream video tower vs the fused stream.

split_cls_stream (vit_spacetime._apply_split + ops/attention.py
divided_attention_split) is a TPU layout optimization — the math must be
identical to the fused (B, 1+F·N, D) path for every tower variant. These run
in f32 on the CPU mesh, where any semantic divergence shows up far above
floating-point noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oatx.models import vit_spacetime as vst
from oatx.ops import attention as attn_mod

BASE = dict(img_size=32, patch_size=16, embed_dim=64, depth=3, num_heads=4,
            num_frames=4, time_init="random")


def _mk(split: bool, **kw):
    return vst.SpaceTimeViTConfig(**{**BASE, **kw, "split_cls_stream": split})


def _video(f=4, b=2, res=32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, f, res, res, 3)), jnp.float32)


@pytest.fixture(params=["concat", "stream"])
def split_merge(request):
    prev = attn_mod._SPLIT_MERGE
    attn_mod.set_split_merge(request.param)
    yield request.param
    attn_mod.set_split_merge(prev)


@pytest.mark.parametrize("variant_kw,frames", [
    ({}, 4),
    ({}, 1),                                           # image degenerate path
    ({"region_tap_layer": 2}, 4),                      # region variant
    ({"pooling": "cls_mean_half"}, 4),                 # global-local variant
    ({"scan_blocks": True}, 4),
    ({"remat": True}, 4),
])
def test_split_stream_matches_fused(variant_kw, frames, split_merge):
    cfg_f = _mk(False, **variant_kw)
    cfg_s = _mk(True, **variant_kw)
    params = vst.init(jax.random.PRNGKey(0), cfg_f)
    video = _video(f=frames)

    out_f = vst.apply(params, cfg_f, video)
    out_s = vst.apply(params, cfg_s, video)
    assert set(out_f) == set(out_s)
    for key in out_f:
        np.testing.assert_allclose(
            np.asarray(out_f[key]), np.asarray(out_s[key]),
            rtol=2e-5, atol=2e-5, err_msg=f"{key} merge={split_merge}")


def test_split_stream_grad_parity(split_merge):
    cfg_f = _mk(False)
    cfg_s = _mk(True)
    params = vst.init(jax.random.PRNGKey(1), cfg_f)
    video = _video(seed=3)

    def loss(cfg):
        return lambda p: jnp.sum(vst.apply(p, cfg, video)["cls"] ** 2)

    g_f = jax.grad(loss(cfg_f))(params)
    g_s = jax.grad(loss(cfg_s))(params)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_f)
    flat_s, _ = jax.tree_util.tree_flatten_with_path(g_s)
    for (path, a), (_, b) in zip(flat_f, flat_s):
        # f32 accumulation-order noise on near-zero elements: bound the error
        # relative to the tensor's own gradient scale, not elementwise.
        scale = max(1e-6, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, rtol=1e-3, atol=1e-3,
            err_msg=jax.tree_util.keystr(path))


def test_split_stream_fused_qkv_falls_back():
    """fused_qkv is fused-stream-only; split_cls_stream must silently defer."""
    cfg = _mk(True, fused_qkv=True)
    params = vst.init(jax.random.PRNGKey(0), cfg)
    out = vst.apply(params, cfg, _video())
    cfg_ref = _mk(False, fused_qkv=False)
    ref = vst.apply(params, cfg_ref, _video())
    np.testing.assert_allclose(np.asarray(out["cls"]), np.asarray(ref["cls"]),
                               rtol=2e-5, atol=2e-5)


def test_split_stream_bf16_close():
    """bf16 compute: accumulation order differs slightly between the paths —
    require close agreement, not bitwise equality."""
    cfg_f = _mk(False)
    cfg_s = _mk(True)
    params = vst.init(jax.random.PRNGKey(2), cfg_f)
    video = _video(seed=5).astype(jnp.bfloat16)
    a = np.asarray(vst.apply(params, cfg_f, video)["cls"], np.float32)
    b = np.asarray(vst.apply(params, cfg_s, video)["cls"], np.float32)
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                             * np.linalg.norm(b, axis=-1) + 1e-8)
    assert cos.min() > 0.999, cos
