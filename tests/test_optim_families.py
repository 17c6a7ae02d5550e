"""Optimizer families (train/optim.py make_optimizer kind=...).

The reference trains with AdamW only (norm.json:82-87); oatx adds Adafactor
(factored second moments — the optimizer-state memory lever at ViT-H scale,
PERF.md remat decision tree), Lion, and momentum SGD. These pin: every family
optimizes a toy problem, Adafactor's state is genuinely factored (byte
accounting), the families compose with clip/freeze/EMA exactly like AdamW,
the config type threads through an end-to-end smoke train, and zero1 state
sharding stays pytree-generic across families.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oatx.train import optim as optimlib

FAMILIES = ["adamw", "adafactor", "lion", "sgd"]


def _toy_params(rng_key, rows=96, cols=160):
    k1, k2 = jax.random.split(rng_key)
    return {"w": jax.random.normal(k1, (rows, cols)) * 0.05,
            "b": jnp.zeros((cols,)),
            "head": {"kernel": jax.random.normal(k2, (cols, 8)) * 0.05}}


def _loss(params, x, y):
    h = jnp.tanh(x @ params["w"] + params["b"])
    pred = h @ params["head"]["kernel"]
    return jnp.mean((pred - y) ** 2)


def _run_steps(tx, params, n=40, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((64, params["w"].shape[0])), jnp.float32)
    y = jnp.asarray(rng.standard_normal((64, 8)), jnp.float32)
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(_loss)(params, x, y)
        updates, state = tx.update(grads, state, params)
        return optax_apply(params, updates), state, loss

    first = None
    for _ in range(n):
        params, state, loss = step(params, state)
        first = float(loss) if first is None else first
    return first, float(loss), state


def optax_apply(params, updates):
    import optax

    return optax.apply_updates(params, updates)


@pytest.mark.parametrize("kind", FAMILIES)
def test_family_optimizes(kind):
    lr = {"adamw": 1e-2, "adafactor": 1e-2, "lion": 1e-3, "sgd": 1e-2}[kind]
    tx = optimlib.make_optimizer(lr=lr, kind=kind)
    params = _toy_params(jax.random.PRNGKey(0))
    first, last, _ = _run_steps(tx, params)
    assert np.isfinite(last)
    assert last < 0.5 * first, (kind, first, last)


def test_sgd_weight_decay_is_decoupled():
    """With ZERO gradients the momentum buffer must stay zero, so each step
    shrinks params by exactly (1 - lr*wd) — coupled (torch-style) decay would
    feed wd*p into the velocity and overshoot from step 2 on."""
    import optax

    lr, wd = 0.1, 0.5
    tx = optimlib.make_optimizer(lr=lr, weight_decay=wd, kind="sgd")
    params = {"w": jnp.full((4,), 2.0)}
    state = tx.init(params)
    for _ in range(2):
        updates, state = tx.update({"w": jnp.zeros((4,))}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               2.0 * (1 - lr * wd) ** 2, rtol=1e-6)


def test_lion_betas_honored_and_defaulted():
    """betas=(0.9, 0.999) passed explicitly must reach optax.lion verbatim
    (no value-sniffing remap); betas=None takes the lion family default
    (0.9, 0.99)."""
    import optax

    params = _toy_params(jax.random.PRNGKey(3))

    def one_update(tx):
        state = tx.init(params)
        x = jnp.ones((8, params["w"].shape[0]))
        y = jnp.zeros((8, 8))
        p, s = params, state
        for _ in range(3):  # >1 step so b2 (the momentum EMA rate) matters
            grads = jax.grad(_loss)(p, x, y)
            updates, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, updates)
        return p

    explicit = one_update(optimlib.make_optimizer(
        lr=1e-3, weight_decay=0.0, kind="lion", betas=(0.9, 0.999)))
    raw999 = one_update(optax.lion(1e-3, b1=0.9, b2=0.999, weight_decay=0.0))
    default = one_update(optimlib.make_optimizer(
        lr=1e-3, weight_decay=0.0, kind="lion"))
    raw99 = one_update(optax.lion(1e-3, b1=0.9, b2=0.99, weight_decay=0.0))
    for k in ("w", "b"):
        np.testing.assert_allclose(np.asarray(explicit[k]),
                                   np.asarray(raw999[k]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(default[k]),
                                   np.asarray(raw99[k]), rtol=1e-6)
    assert not np.allclose(np.asarray(explicit["w"]), np.asarray(default["w"]))


def test_unknown_family_rejected():
    with pytest.raises(ValueError):
        optimlib.make_optimizer(kind="adamax")


def _state_bytes(state):
    return sum(np.asarray(l).nbytes for l in jax.tree_util.tree_leaves(state)
               if hasattr(l, "nbytes") or isinstance(l, jnp.ndarray))


def test_adafactor_state_is_factored():
    """For a big matrix param, adafactor's state must be O(rows+cols), not
    O(rows*cols): total state well under half of AdamW's two full moments."""
    params = {"w": jnp.zeros((512, 768))}
    adamw = optimlib.make_optimizer(kind="adamw").init(params)
    adaf = optimlib.make_optimizer(kind="adafactor").init(params)
    assert _state_bytes(adaf) < 0.2 * _state_bytes(adamw), (
        _state_bytes(adaf), _state_bytes(adamw))


def test_lion_state_is_single_moment():
    params = {"w": jnp.zeros((256, 256))}
    adamw = optimlib.make_optimizer(kind="adamw").init(params)
    lion = optimlib.make_optimizer(kind="lion").init(params)
    assert _state_bytes(lion) <= 0.6 * _state_bytes(adamw)


@pytest.mark.parametrize("kind", ["adafactor", "lion"])
def test_composes_with_clip_freeze_ema(kind):
    tx = optimlib.make_optimizer(
        lr=1e-3, kind=kind, grad_clip=1.0,
        trainable_filter=lambda path: path[0] != "b",  # freeze the bias
        ema_decay=0.9)
    params = _toy_params(jax.random.PRNGKey(1))
    _, last, state = _run_steps(tx, params, n=10)
    assert np.isfinite(last)
    ema = optimlib.find_ema(state)
    assert ema is not None and ema["w"].shape == params["w"].shape
    # frozen leaf: updates were zeroed, so the EMA of b stays exactly 0
    assert np.allclose(np.asarray(ema["b"]), 0.0)


def test_config_type_threads_to_smoke_train(tmp_path):
    """optimizer.type: 'Adafactor' in a config JSON must drive the real
    trainer end-to-end (schema → Trainer → make_optimizer)."""
    import json
    import pathlib
    import subprocess
    import sys

    cfg = json.loads(pathlib.Path("configs/smoke/synthetic.json").read_text())
    cfg["optimizer"]["type"] = "Adafactor"
    for dl in (cfg["data_loader"] if isinstance(cfg["data_loader"], list)
               else [cfg["data_loader"]]):
        dl["args"]["batch_size"] = 8  # 8-device CPU test mesh
    cfg["trainer"]["epochs"] = 1
    cfg["trainer"]["save_dir"] = str(tmp_path / "save")
    p = tmp_path / "adafactor.json"
    p.write_text(json.dumps(cfg))
    out = subprocess.run(
        [sys.executable, "-m", "oatx.cli.train", "-c", str(p),
         "--no_timestamp"],
        capture_output=True, text=True, timeout=900,
        env=_cpu_env())
    assert out.returncode == 0, out.stderr[-2000:]


def test_zero1_sharding_generic_over_adafactor():
    """zero1 opt-state sharding is pytree-generic: it must place adafactor's
    factored vectors (and scalars) without assuming AdamW's structure."""
    from jax.sharding import Mesh

    from oatx.parallel import mesh as meshlib, sharding as shardlib

    mesh = meshlib.make_mesh(8, model_parallel=1)
    params = {"w": jnp.zeros((64, 128)), "b": jnp.zeros((128,))}
    state = optimlib.make_optimizer(kind="adafactor").init(params)
    sharded = shardlib.shard_opt_state_zero1(mesh, state)
    # every leaf still loads and the tree structure is unchanged
    assert jax.tree_util.tree_structure(sharded) == \
        jax.tree_util.tree_structure(state)
    for leaf in jax.tree_util.tree_leaves(sharded):
        np.asarray(leaf)  # materializes — placement was valid


def _cpu_env():
    import os

    env = dict(os.environ)
    env["OATX_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    return env
