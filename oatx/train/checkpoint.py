"""Checkpoint save/restore (Orbax) + reference-checkpoint import.

Reference behavior reproduced (base_trainer.py:163-244):
  * periodic `checkpoint-epoch{N}` + monitored `model_best`;
  * resume restores epoch, monitor best, params and optimizer state;
  * arbitrary torch `.pth` import via oatx.models.convert (DataParallel prefix
    fix + temporal-embed inflation) for cross-framework weight compatibility.

State layout: a composite of the train-state pytree and a JSON metadata blob
{epoch, monitor_best, step}.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _tree_to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


# process-wide async checkpointer (orbax serializes saves internally; one
# instance so wait_for_async_saves() has a single authority)
_ASYNC_CKPTR = None


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_async_saves() -> None:
    """Block until every in-flight async checkpoint write has committed.
    Call before restoring, before process exit, and before reading a snapshot
    that may still be in flight."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(
    ckpt_dir: str | Path,
    name: str,
    state,
    epoch: int,
    monitor_best: float,
    keep: Optional[int] = None,
    extra_meta: Optional[Dict[str, Any]] = None,
    async_save: bool = False,
) -> Path:
    """Save under ckpt_dir/name (an Orbax StandardCheckpointer snapshot).
    extra_meta: e.g. {'cycles_done': N} for mid-epoch preemption snapshots.

    async_save=True returns after the device→host copy and commits the file
    write in a background thread (Orbax AsyncCheckpointer) — training resumes
    while ~GBs of optimizer state stream to disk. Orbax writes to a temp dir
    and renames on commit, so a crash mid-write never leaves a readable
    half-snapshot; the .meta.json sidecar is written immediately (restore
    validates the snapshot dir itself). Preemption snapshots should stay
    synchronous — the process may die right after."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / name
    tree = {"params": state.params, "opt_state": state.opt_state,
            "step": state.step}
    if async_save:
        ckptr = _async_checkpointer()
        # orbax queues at most one in-flight save; waiting here makes
        # back-to-back saves (epoch + model_best) well-defined
        ckptr.wait_until_finished()
        ckptr.save(path, args=ocp.args.StandardSave(tree), force=True)
    else:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, _tree_to_numpy(tree), force=True)
    meta = {"epoch": int(epoch), "monitor_best": float(monitor_best),
            "step": int(state.step)}
    if extra_meta:
        meta.update(extra_meta)
    with open(ckpt_dir / f"{name}.meta.json", "w") as f:
        json.dump(meta, f)
    if keep is not None:
        # count the (possibly still-committing) snapshot being written too —
        # async saves exist only as an orbax tmp dir until commit
        _gc_old(ckpt_dir, keep, pending=name)
    return path


def _gc_old(ckpt_dir: Path, keep: int, pending: Optional[str] = None) -> None:
    import re
    import shutil

    snaps = []
    seen = set()
    for p in ckpt_dir.iterdir():
        m = re.fullmatch(r"checkpoint-epoch(\d+)", p.name)
        if m:
            snaps.append((int(m.group(1)), p))
            seen.add(p.name)
    if pending is not None and pending not in seen:
        m = re.fullmatch(r"checkpoint-epoch(\d+)", pending)
        if m:  # in-flight async snapshot: counts toward keep, never deleted
            snaps.append((int(m.group(1)), None))
            seen.add(pending)
    snaps = [(e, p) for e, p in sorted(snaps)[:-keep] if p is not None]
    for _, p in snaps:
        shutil.rmtree(p, ignore_errors=True)
        meta = p.with_name(p.name + ".meta.json")
        if meta.exists():
            meta.unlink()
    # orphaned sidecars: a kill between queueing an async save and orbax's
    # tmp-dir commit rename leaves name.meta.json with no snapshot dir —
    # phantom checkpoints that resume tooling would trip over. The in-flight
    # `pending` name is exempt (its dir legitimately doesn't exist yet).
    for p in ckpt_dir.glob("checkpoint-epoch*.meta.json"):
        snap = p.name[: -len(".meta.json")]
        if snap not in seen and not (ckpt_dir / snap).exists():
            p.unlink(missing_ok=True)


def restore_checkpoint(path: str | Path, state_template) -> Tuple[Any, Dict[str, Any]]:
    """Restore a snapshot into the template's structure → (state_dict, meta)."""
    import orbax.checkpoint as ocp

    wait_for_async_saves()  # a same-process snapshot may still be committing
    path = Path(path).resolve()
    template = _tree_to_numpy({
        "params": state_template.params,
        "opt_state": state_template.opt_state,
        "step": state_template.step,
    })
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, template)
    meta_path = path.with_name(path.name + ".meta.json")
    meta = {"epoch": 0, "monitor_best": float("inf"), "step": 0}
    if meta_path.exists():
        meta.update(json.loads(meta_path.read_text()))
    return restored, meta


def _find_ema_subtree(tree):
    """Locate an EmaState's 'ema' param tree in a template-free orbax restore
    (namedtuples come back as plain containers, so search by the field name)."""
    if isinstance(tree, dict):
        if "ema" in tree and isinstance(tree["ema"], dict):
            return tree["ema"]
        for v in tree.values():
            hit = _find_ema_subtree(v)
            if hit is not None:
                return hit
    elif isinstance(tree, (list, tuple)):
        for v in tree:
            hit = _find_ema_subtree(v)
            if hit is not None:
                return hit
    return None


def import_initial_weights(
    load_checkpoint: str,
    tower_cfg,
    fresh_params,
    temporal_fix: str = "zeros",
    prefer_ema: bool = False,
):
    """Reference `load_checkpoint` semantics (model.py:74-79): if the path is a
    torch .pth/.pth.tar, convert; if it is an oatx/orbax snapshot, restore params
    only; '' → fresh params. prefer_ema=True loads the EMA params from a
    snapshot trained with trainer.ema_decay (falls back to raw params, with a
    warning, when the snapshot carries no EMA)."""
    if not load_checkpoint:
        return fresh_params
    p = Path(load_checkpoint)
    if not p.exists():
        raise FileNotFoundError(f"load_checkpoint not found: {load_checkpoint}")
    if p.is_file() and p.suffix in (".pth", ".tar", ".pt") or str(p).endswith(".pth.tar"):
        from oatx.models import convert

        sd = convert.load_torch_checkpoint(str(p))
        return convert.frozen_in_time_from_torch(
            sd, tower_cfg.video, tower_cfg.text,
            fresh_video_params=fresh_params["video"], temporal_fix=temporal_fix,
            text_family=getattr(tower_cfg, "text_family", "distilbert"))
    # orbax snapshot dir: restore (template-free) and take the params subtree
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(p.resolve())
    if prefer_ema:
        ema = _find_ema_subtree(restored.get("opt_state"))
        if ema is not None:
            return ema
        import logging

        logging.getLogger("oatx.checkpoint").warning(
            "--ema requested but %s carries no EMA state (trained without "
            "trainer.ema_decay?) — using raw params", p)
    return restored["params"]
