import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oatx.losses import contrastive as C


def _torch_norm_softmax(sims_np, temperature=0.05):
    """Golden oracle: the reference NormSoftmaxLoss formula (loss.py:7-25)."""
    import torch
    import torch.nn.functional as F

    x = torch.from_numpy(sims_np)
    i_logsm = F.log_softmax(x / temperature, dim=1)
    j_logsm = F.log_softmax(x.t() / temperature, dim=1)
    loss_i = torch.diag(i_logsm).sum() / len(torch.diag(i_logsm))
    loss_j = torch.diag(j_logsm).sum() / len(torch.diag(j_logsm))
    return float(-loss_i - loss_j)


def test_sim_matrix_is_cosine(rng):
    a = rng.standard_normal((5, 16)).astype(np.float32)
    b = rng.standard_normal((7, 16)).astype(np.float32)
    sims = np.asarray(C.sim_matrix(jnp.array(a), jnp.array(b)))
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    np.testing.assert_allclose(sims, an @ bn.T, atol=1e-5)


def test_sim_matrix_zero_row_stable():
    a = jnp.zeros((2, 8))
    b = jnp.ones((3, 8))
    sims = C.sim_matrix(a, b)
    assert np.isfinite(np.asarray(sims)).all()


def test_norm_softmax_matches_torch(rng):
    sims = (rng.uniform(size=(10, 10)).astype(np.float32) * 2 - 1)
    got = float(C.norm_softmax_loss(jnp.array(sims)))
    want = _torch_norm_softmax(sims)
    assert got == pytest.approx(want, rel=1e-5)


def test_norm_softmax_rect_matches_torch(rng):
    # reference torch.diag on a rectangular matrix takes min-dim diagonal
    sims = rng.uniform(size=(10, 8)).astype(np.float32) * 2 - 1
    got = float(C.norm_softmax_loss(jnp.array(sims)))
    want = _torch_norm_softmax(sims)
    assert got == pytest.approx(want, rel=1e-5)


def test_norm_softmax_global_equals_local_concat(rng):
    """All-gather loss over a mesh axis == loss over concatenated batch."""
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == 8, "conftest should force 8 CPU devices"
    mesh = Mesh(np.array(devs), ("data",))
    t = rng.standard_normal((16, 32)).astype(np.float32)
    v = rng.standard_normal((16, 32)).astype(np.float32)

    def local_loss(tt, vv):
        return C.norm_softmax_loss_global(tt, vv, axis_name="data")

    sharded = jax.shard_map(
        local_loss, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P(),
        check_vma=False,
    )
    got = float(jax.jit(sharded)(t, v))
    want = float(C.norm_softmax_loss(C.sim_matrix(jnp.array(t), jnp.array(v))))
    assert got == pytest.approx(want, rel=1e-5)


def test_norm_softmax_global_gradient_matches(rng):
    """Gradient through the shard_map all-gather == single-host gradient
    (the reference AllGather_multi backward slice semantics)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("data",))
    t = rng.standard_normal((16, 32)).astype(np.float32)
    v = rng.standard_normal((16, 32)).astype(np.float32)

    def global_loss(tt, vv):
        return C.norm_softmax_loss(C.sim_matrix(tt, vv))

    def dist_loss(tt, vv):
        f = jax.shard_map(
            lambda a, b: C.norm_softmax_loss_global(a, b, axis_name="data"),
            mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P(),
            check_vma=False,
        )
        return f(tt, vv)

    g_single = jax.grad(global_loss)(jnp.array(t), jnp.array(v))
    g_dist = jax.jit(jax.grad(dist_loss))(
        jax.device_put(t, NamedSharding(mesh, P("data"))),
        jax.device_put(v, NamedSharding(mesh, P("data"))),
    )
    np.testing.assert_allclose(np.asarray(g_dist), np.asarray(g_single), atol=1e-5)


def test_chunked_loss_matches_dense(rng):
    t = rng.standard_normal((40, 64)).astype(np.float32)
    v = rng.standard_normal((40, 64)).astype(np.float32)
    dense = float(C.norm_softmax_loss(C.sim_matrix(jnp.array(t), jnp.array(v))))
    chunked = float(C.norm_softmax_loss_chunked(jnp.array(t), jnp.array(v), chunk=16))
    assert chunked == pytest.approx(dense, rel=1e-5)


def test_max_margin_matches_torch(rng):
    import torch

    sims = rng.standard_normal((12, 12)).astype(np.float32)

    # golden oracle: reference MaxMarginRankingLoss (loss.py:28-63) with fix_norm
    x = torch.from_numpy(sims)
    n = x.size()[0]
    x1 = torch.diag(x).unsqueeze(1).expand(n, n).contiguous().view(-1, 1)
    x1 = torch.cat((x1, x1), 0)
    x2 = torch.cat((x.view(-1, 1), x.transpose(0, 1).contiguous().view(-1, 1)), 0)
    keep = torch.ones(x.shape) - torch.eye(x.shape[0])
    keep_idx = torch.nonzero(
        torch.cat((keep.view(-1, 1), keep.transpose(0, 1).contiguous().view(-1, 1)), 0).flatten()
    ).flatten()
    x1_ = torch.index_select(x1, dim=0, index=keep_idx)
    x2_ = torch.index_select(x2, dim=0, index=keep_idx)
    want = float(torch.nn.functional.relu(1.0 - (x1_ - x2_)).mean())

    got = float(C.max_margin_ranking_loss(jnp.array(sims), margin=1.0, fix_norm=True))
    assert got == pytest.approx(want, rel=1e-5)


def test_cross_entropy_matches_torch(rng):
    import torch

    logits = rng.standard_normal((6, 10)).astype(np.float32)
    targets = rng.integers(0, 10, 6)
    want = float(
        torch.nn.functional.cross_entropy(
            torch.from_numpy(logits), torch.from_numpy(targets)
        )
    )
    got = float(C.cross_entropy_loss(jnp.array(logits), jnp.array(targets)))
    assert got == pytest.approx(want, rel=1e-5)


def test_nce_softmax_is_ce_at_zero(rng):
    logits = rng.standard_normal((5, 9)).astype(np.float32)
    got = float(C.nce_softmax_loss(jnp.array(logits)))
    want = float(C.cross_entropy_loss(jnp.array(logits), jnp.zeros(5, dtype=jnp.int32)))
    assert got == pytest.approx(want, rel=1e-6)


def test_softmax_kl_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    a = rng.standard_normal((4, 7)).astype(np.float32)
    b = rng.standard_normal((4, 7)).astype(np.float32)
    want = float(
        F.kl_div(
            F.log_softmax(torch.from_numpy(a), dim=1),
            F.softmax(torch.from_numpy(b), dim=1),
            reduction="sum",
        )
    )
    got = float(C.softmax_kl_loss(jnp.array(a), jnp.array(b)))
    assert got == pytest.approx(want, rel=1e-4)


def test_bce_pair(rng):
    probs = rng.uniform(0.01, 0.99, (4, 9)).astype(np.float32)
    targets = (rng.uniform(size=(4, 9)) > 0.5).astype(np.float32)
    logits = np.log(probs / (1 - probs)).astype(np.float32)
    a = float(C.binary_cross_entropy(jnp.array(probs), jnp.array(targets)))
    b = float(C.sigmoid_binary_cross_entropy(jnp.array(logits), jnp.array(targets)))
    assert a == pytest.approx(b, rel=1e-4)
    import torch

    want = float(
        torch.nn.functional.binary_cross_entropy(
            torch.from_numpy(probs), torch.from_numpy(targets)
        )
    )
    assert a == pytest.approx(want, rel=1e-5)


def test_region_bce_matches_reference_reduction(rng):
    """region_bce == BCELoss(reduction='sum')(sigmoid(logits), t) / rows — the
    reference's region-map loss scaling (trainer_region_mem.py:96,166)."""
    import torch

    B, K, N = 3, 5, 196
    logits = rng.standard_normal((B, K, N)).astype(np.float32)
    targets = (rng.uniform(size=(B, K, N)) > 0.9).astype(np.float32)
    got = float(C.region_bce(jnp.array(logits), jnp.array(targets)))
    t_sim = torch.sigmoid(torch.from_numpy(logits)).view(-1, N)
    t_mask = torch.from_numpy(targets).view(-1, N)
    want = float(torch.nn.BCELoss(reduction="sum")(t_sim, t_mask) / t_sim.size(0))
    assert got == pytest.approx(want, rel=1e-4)


def test_moco_queue_roundtrip(rng):
    q = C.moco_queue_init(jax.random.PRNGKey(0), queue_size=16, dim=8)
    k1 = jnp.array(rng.standard_normal((6, 8)), jnp.float32)
    q2 = C.moco_queue_update(q, k1)
    assert int(q2.index) == 6
    np.testing.assert_allclose(np.asarray(q2.memory[:6]), np.asarray(k1), atol=1e-6)
    # wrap-around
    k2 = jnp.array(rng.standard_normal((14, 8)), jnp.float32)
    q3 = C.moco_queue_update(q2, k2)
    assert int(q3.index) == (6 + 14) % 16
    np.testing.assert_allclose(np.asarray(q3.memory[6:16]), np.asarray(k2[:10]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(q3.memory[0:4]), np.asarray(k2[10:]), atol=1e-6)


def test_moco_logits_shape(rng):
    queue = C.moco_queue_init(jax.random.PRNGKey(1), queue_size=32, dim=8)
    q = jnp.array(rng.standard_normal((4, 8)), jnp.float32)
    k = jnp.array(rng.standard_normal((4, 8)), jnp.float32)
    n = jnp.array(rng.standard_normal((4, 8)), jnp.float32)
    out = C.moco_logits(q, k, n, queue)
    assert out.shape == (4, 1 + 32 + 1)


def test_fine_grained_loss_runs(rng):
    r = jnp.array(rng.standard_normal((6, 10, 32)), jnp.float32)
    t = jnp.array(rng.standard_normal((6, 5, 32)), jnp.float32)
    loss = C.fine_grained_region_tag_loss(r, t)
    assert np.isfinite(float(loss))


def test_losses_match_reference_module_exactly(rng):
    """Import the reference's own loss.py (not a transcription) and compare
    NormSoftmaxLoss / MaxMarginRankingLoss / CrossEntropy on identical sims."""
    import importlib.util
    import os

    import torch

    path = "/root/reference/OATrans/model/loss.py"
    if not os.path.exists(path):
        pytest.skip("reference repo not available")
    spec = importlib.util.spec_from_file_location("ref_loss", path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    sims = rng.standard_normal((16, 16)).astype(np.float32)
    t_sims = torch.from_numpy(sims)
    want = float(ref.NormSoftmaxLoss(temperature=0.05)(t_sims))
    got = float(C.norm_softmax_loss(jnp.array(sims), 0.05))
    assert got == pytest.approx(want, rel=1e-5)

    want = float(ref.MaxMarginRankingLoss(margin=0.2, fix_norm=True)(t_sims))
    got = float(C.max_margin_ranking_loss(jnp.array(sims), margin=0.2, fix_norm=True))
    assert got == pytest.approx(want, rel=1e-5)

    want = float(ref.MaxMarginRankingLoss(margin=0.2, fix_norm=False)(t_sims))
    got = float(C.max_margin_ranking_loss(jnp.array(sims), margin=0.2, fix_norm=False))
    assert got == pytest.approx(want, rel=1e-5)
