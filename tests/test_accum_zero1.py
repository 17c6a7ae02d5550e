import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oatx.models import towers, distilbert as dbert, vit_spacetime as vst
from oatx.parallel import mesh as meshlib, sharding
from oatx.train import optim, step as steplib


@pytest.fixture(scope="module")
def tiny():
    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(img_size=32, patch_size=16, embed_dim=32,
                                     depth=1, num_heads=2, num_frames=1),
        text=dbert.DistilBertConfig(vocab_size=64, max_position_embeddings=16,
                                    dim=32, hidden_dim=64, n_layers=1, n_heads=2),
        projection_dim=8)
    params = towers.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.array(rng.standard_normal((8, 1, 32, 32, 3)), jnp.float32),
        "input_ids": jnp.array(rng.integers(0, 64, (8, 8))),
        "attention_mask": jnp.ones((8, 8), jnp.int32),
    }
    return cfg, params, batch


def test_grad_accumulation_matches_mean_of_micro_grads(tiny):
    cfg, params, batch = tiny
    opt = optim.make_optimizer(lr=0.0, weight_decay=0.0)  # lr 0: params frozen
    sA = steplib.init_state(jax.random.PRNGKey(1), cfg, opt, params=params)
    sB = steplib.init_state(jax.random.PRNGKey(1), cfg, opt, params=params)
    step1 = steplib.make_train_step(cfg, steplib.LossConfig(), opt, donate=False)
    step4 = steplib.make_train_step(cfg, steplib.LossConfig(), opt, donate=False,
                                    accum_steps=4)
    _, m4 = step4(sB, batch)
    # mean of per-micro-batch losses
    micro_losses = []
    for i in range(4):
        mb = {k: v[i * 2:(i + 1) * 2] for k, v in batch.items()}
        l, _ = steplib.loss_fn(params, cfg, steplib.LossConfig(), mb)
        micro_losses.append(float(l))
    assert float(m4["loss"]) == pytest.approx(np.mean(micro_losses), rel=1e-5)
    # grad_norm finite and params updated identically at lr 0 (no change)
    assert np.isfinite(float(m4["grad_norm"]))


def test_accum_trains(tiny):
    cfg, params, batch = tiny
    opt = optim.make_optimizer(lr=1e-3)
    # copy: the donated step would invalidate the shared fixture's buffers
    params = jax.tree_util.tree_map(jnp.array, params)
    state = steplib.init_state(jax.random.PRNGKey(1), cfg, opt, params=params)
    step = steplib.make_train_step(cfg, steplib.LossConfig(), opt, accum_steps=2)
    losses = []
    for _ in range(5):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_zero1_sharding_runs_and_matches(tiny):
    cfg, params, batch = tiny
    mesh = meshlib.make_mesh(8, model_parallel=1)
    opt = optim.make_optimizer(lr=1e-3)

    sp = sharding.shard_params(mesh, params)
    s_plain = steplib.init_state(jax.random.PRNGKey(1), cfg, opt, params=sp)
    s_zero = steplib.TrainState(
        s_plain.params,
        sharding.shard_opt_state_zero1(mesh, s_plain.opt_state),
        s_plain.step)
    step = steplib.make_train_step(cfg, steplib.LossConfig(), opt, donate=False)
    b = meshlib.shard_batch(mesh, {k: np.asarray(v) for k, v in batch.items()})
    s1, m1 = step(s_plain, b)
    s2, m2 = step(s_zero, b)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)
    # updates identical regardless of opt-state placement
    np.testing.assert_allclose(
        np.asarray(s1.params["vid_proj"]["kernel"]),
        np.asarray(s2.params["vid_proj"]["kernel"]), atol=1e-6)
    # moments actually sharded over data axis
    import optax

    mu = s_zero.opt_state[0].mu if hasattr(s_zero.opt_state[0], "mu") else None
    if mu is not None:
        leaf = mu["text"]["embeddings"]["word"]
        assert "data" in str(leaf.sharding.spec)


def test_skip_nonfinite_step_is_noop():
    """A batch that produces a non-finite loss must leave params, moments and
    the step counter untouched (skip_nonfinite=True) instead of poisoning the
    Adam moments; a clean batch afterwards trains normally."""
    import jax
    import jax.numpy as jnp

    from oatx.models import distilbert as dbert, towers, vit_spacetime as vst
    from oatx.train import optim, step as steplib

    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(img_size=32, patch_size=16, embed_dim=32,
                                     depth=1, num_heads=2, num_frames=2),
        text=dbert.DistilBertConfig(vocab_size=64, max_position_embeddings=16,
                                    dim=32, hidden_dim=64, n_layers=1, n_heads=2),
        projection_dim=8, variant="baseline")
    optimizer = optim.make_optimizer(lr=1e-3)
    state = steplib.init_state(jax.random.PRNGKey(0), cfg, optimizer)
    step = steplib.make_train_step(cfg, steplib.LossConfig(), optimizer,
                                   donate=False, skip_nonfinite=True)
    rng = np.random.default_rng(0)
    clean = {
        "video": jnp.asarray(rng.standard_normal((4, 2, 32, 32, 3)), jnp.float32),
        "input_ids": jnp.asarray(rng.integers(0, 64, (4, 8))),
        "attention_mask": jnp.ones((4, 8), jnp.int32)}
    poisoned = dict(clean)
    poisoned["video"] = clean["video"].at[0, 0, 0, 0, 0].set(jnp.nan)

    s1, m1 = step(state, poisoned)
    assert float(m1["skipped"]) == 1.0
    assert int(s1.step) == int(state.step)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    s2, m2 = step(s1, clean)
    assert float(m2["skipped"]) == 0.0 and np.isfinite(float(m2["loss"]))
    assert int(s2.step) == int(state.step) + 1
    changed = any(not np.array_equal(np.asarray(a), np.asarray(b))
                  for a, b in zip(jax.tree_util.tree_leaves(s2.params),
                                  jax.tree_util.tree_leaves(s1.params)))
    assert changed


def test_fwd_chunk_matches_plain_step(tiny):
    """fwd_chunk (remat-scan tower forwards + full-batch loss) must be
    SEMANTICALLY IDENTICAL to the plain step — same loss, same one-step
    update — unlike accum_steps, which micro-batches the negatives."""
    cfg, params, batch = tiny
    opt = optim.make_optimizer(lr=1e-3)
    pA = jax.tree_util.tree_map(jnp.array, params)
    pB = jax.tree_util.tree_map(jnp.array, params)
    sA = steplib.init_state(jax.random.PRNGKey(1), cfg, opt, params=pA)
    sB = steplib.init_state(jax.random.PRNGKey(1), cfg, opt, params=pB)
    plain = steplib.make_train_step(cfg, steplib.LossConfig(), opt, donate=False)
    chunked = steplib.make_train_step(cfg, steplib.LossConfig(), opt,
                                      donate=False, fwd_chunk=2)
    sA, mA = plain(sA, batch)
    sB, mB = chunked(sB, batch)
    assert float(mB["loss"]) == pytest.approx(float(mA["loss"]), rel=1e-5)
    # compare RAW gradients, not Adam updates: grad/sqrt(v) amplifies the
    # scan's fp-reordered low bits unboundedly where grads are ~0
    gfn = jax.jit(lambda p, b, c: jax.grad(
        lambda q: steplib.loss_fn(q, cfg, steplib.LossConfig(), b, c)[0])(p),
        static_argnums=2)
    gA = gfn(pA, batch, None)
    gB = gfn(pA, batch, 2)
    for a, b in zip(jax.tree_util.tree_leaves(gA), jax.tree_util.tree_leaves(gB)):
        a, b = np.asarray(a), np.asarray(b)
        tol = 5e-6 + 1e-4 * np.abs(a).max()
        np.testing.assert_allclose(a, b, atol=tol, rtol=0)


def test_fwd_chunk_variant_forward(tiny):
    """fwd_chunk routes every variant's forward through the scan; region_mem
    exercises per-sample non-embed batch keys (patch_masks, memory rows)."""
    cfg0, _, _ = tiny
    import dataclasses as dc
    cfg = dc.replace(
        cfg0, variant="region_mem",
        video=dc.replace(cfg0.video, region_tap_layer=1))
    params = towers.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    n = cfg.video.patches_per_frame
    batch = {
        "video": jnp.array(rng.standard_normal((4, 1, 32, 32, 3)), jnp.float32),
        "object_frame": jnp.array(rng.standard_normal((4, 1, 32, 32, 3)), jnp.float32),
        "input_ids": jnp.array(rng.integers(0, 64, (4, 8))),
        "attention_mask": jnp.ones((4, 8), jnp.int32),
        "patch_masks": jnp.array(rng.integers(0, 2, (4, 1, n)), jnp.float32),
        "text_region_embedding": jnp.array(
            rng.standard_normal((4, 1, 512)), jnp.float32),
    }
    l_plain, _ = steplib.loss_fn(params, cfg, steplib.LossConfig(), batch)
    l_chunk, _ = steplib.loss_fn(params, cfg, steplib.LossConfig(), batch,
                                 fwd_chunk=2)
    assert float(l_chunk) == pytest.approx(float(l_plain), rel=1e-5)


def test_fwd_chunk_shard_map_matches_plain_gspmd_step(tiny):
    """Multi-chip fwd_chunk: per-chip remat-scan under shard_map with GLOBAL-
    batch negatives must match the plain GSPMD step — same loss, same raw
    gradients — on an 8-wide data axis (pure DP, replicated params)."""
    cfg, params, batch = tiny
    mesh = meshlib.make_mesh(8)  # data=8, model=1
    params_s = sharding.shard_params(mesh, params)
    batch_s = meshlib.shard_batch(mesh, batch)  # local bs = 1 per device
    lc = steplib.LossConfig()

    def gfn(chunk, m):
        return jax.jit(lambda p, b: jax.value_and_grad(
            lambda q: steplib.loss_fn(q, cfg, lc, b, chunk, m)[0])(p))

    (lA, gA) = gfn(None, None)(params_s, batch_s)
    (lB, gB) = gfn(1, mesh)(params_s, batch_s)  # 1 sample/scan-iter per chip
    assert float(lB) == pytest.approx(float(lA), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gA), jax.tree_util.tree_leaves(gB)):
        a, b = np.asarray(a), np.asarray(b)
        tol = 5e-6 + 1e-4 * np.abs(a).max()
        np.testing.assert_allclose(a, b, atol=tol, rtol=0)
