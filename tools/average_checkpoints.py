"""Average the params of N oatx snapshots into one (model-soup style).

    python tools/average_checkpoints.py --out <dir> <ckpt1> <ckpt2> ... [--ema]

Writes an orbax snapshot containing only {"params": mean} — loadable anywhere
a checkpoint is accepted (arch.load_checkpoint / -r in cli.test, cli.serve,
tools/build_index.py). --ema averages each snapshot's EMA params instead of
its raw params (snapshots must be trained with trainer.ema_decay).

Uniform soups of fine-tuning runs are a standard cheap accuracy lever the
reference has no counterpart for; this stays a host-side numpy pass (no
device memory: snapshots stream one at a time).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def _tree_add(acc, tree, scale):
    if isinstance(tree, dict):
        return {k: _tree_add(acc[k] if acc else None, v, scale)
                for k, v in tree.items()}
    arr = np.asarray(tree, np.float64) * scale
    return arr if acc is None else acc + arr


def _tree_cast(tree, like):
    if isinstance(tree, dict):
        return {k: _tree_cast(v, like[k]) for k, v in tree.items()}
    return tree.astype(np.asarray(like).dtype)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("checkpoints", nargs="+")
    p.add_argument("--out", required=True)
    p.add_argument("--ema", action="store_true",
                   help="average each snapshot's EMA params instead of raw")
    args = p.parse_args(argv)

    import orbax.checkpoint as ocp

    from oatx.train.checkpoint import _find_ema_subtree

    acc, first = None, None
    scale = 1.0 / len(args.checkpoints)
    for path in args.checkpoints:
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(_os.path.abspath(path))
        params = restored["params"]
        if args.ema:
            ema = _find_ema_subtree(restored.get("opt_state"))
            if ema is None:
                print(f"error: {path} carries no EMA state", file=sys.stderr)
                return 1
            params = ema
        if first is None:
            first = params
        acc = _tree_add(acc, params, scale)

    avg = _tree_cast(acc, first)
    out = _os.path.abspath(args.out)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(out, {"params": avg}, force=True)
    n_leaves = len([1 for _ in _iter_leaves(avg)])
    print(json.dumps({"out": out, "averaged": len(args.checkpoints),
                      "param_tensors": n_leaves,
                      "source": "ema" if args.ema else "params"}))
    return 0


def _iter_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    sys.exit(main())
