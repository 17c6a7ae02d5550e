"""Async checkpointing: background-committed snapshots must round-trip
identically to synchronous ones, and restore must fence in-flight writes."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from oatx.train import checkpoint as ckptlib


@dataclasses.dataclass
class _State:
    params: dict
    opt_state: dict
    step: jnp.ndarray


def _state(seed=0):
    k = jax.random.PRNGKey(seed)
    params = {"w": jax.random.normal(k, (64, 64)), "b": jnp.zeros((64,))}
    opt = {"mu": jax.tree_util.tree_map(jnp.zeros_like, params)}
    return _State(params, opt, jnp.asarray(7, jnp.int32))


def test_async_save_round_trips(tmp_path):
    st = _state()
    path = ckptlib.save_checkpoint(tmp_path / "ck", "checkpoint-epoch1", st,
                                   epoch=1, monitor_best=0.5, async_save=True,
                                   extra_meta={"cycles_done": 3})
    # restore fences the in-flight write itself (wait_for_async_saves)
    restored, meta = ckptlib.restore_checkpoint(path, st)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(st.params["w"]))
    np.testing.assert_array_equal(np.asarray(restored["opt_state"]["mu"]["w"]),
                                  np.asarray(st.opt_state["mu"]["w"]))
    assert meta["epoch"] == 1 and meta["cycles_done"] == 3
    assert int(restored["step"]) == 7
    # the sidecar is valid JSON on disk
    side = json.loads((tmp_path / "ck" / "checkpoint-epoch1.meta.json").read_text())
    assert side["monitor_best"] == 0.5


def test_async_back_to_back_saves_and_gc(tmp_path):
    """epoch + model_best back-to-back saves (the Trainer's pattern) and keep=
    GC must be well-defined with async commits."""
    for epoch in range(1, 6):
        st = _state(epoch)
        ckptlib.save_checkpoint(tmp_path / "ck", f"checkpoint-epoch{epoch}", st,
                                epoch=epoch, monitor_best=0.1, keep=3,
                                async_save=True)
        ckptlib.save_checkpoint(tmp_path / "ck", "model_best", st,
                                epoch=epoch, monitor_best=0.1, async_save=True)
    ckptlib.wait_for_async_saves()
    names = sorted(p.name for p in (tmp_path / "ck").iterdir()
                   if p.is_dir() and not p.name.startswith("."))
    assert names == ["checkpoint-epoch3", "checkpoint-epoch4",
                     "checkpoint-epoch5", "model_best"], names
    restored, meta = ckptlib.restore_checkpoint(
        tmp_path / "ck" / "model_best", _state())
    assert meta["epoch"] == 5
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(_state(5).params["w"]))
