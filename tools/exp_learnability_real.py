"""Real-chip learnability run: metric trajectory for PERF.md (VERDICT r4 #1).

The CPU-mesh proof lives in tests/test_learnability.py (slow). This script
repeats the same recipe on whatever platform is default (the axon TPU in this
environment) with a validation loader attached and trainer.val_period
amortizing the eval pass, and prints one JSON line per validated epoch:

    python tools/exp_learnability_real.py [--epochs 1000] [--val-period 100]

Same corpus/model/schedule as the test: 16 fixture_seeded clips, dim-64
towers, AdamW lr 6e-3 cosine + 50-step warmup. Appends nothing; copy the
trajectory into PERF.md.
"""

from __future__ import annotations

import argparse
import json
import os as _os
import sys
import tempfile
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--val-period", type=int, default=100)
    p.add_argument("--clips", type=int, default=16)
    args = p.parse_args(argv)

    import jax

    if _os.environ.get("OATX_PLATFORM"):
        jax.config.update("jax_platforms", _os.environ["OATX_PLATFORM"])

    import sys as _sys

    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "tests"))
    from test_learnability import _cfg

    from oatx.config.schema import ExperimentCfg
    from oatx.data.factory import build_loaders
    from oatx.data.tokenizer import WordPieceTokenizer
    from oatx.train.trainer import Trainer

    import pathlib

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="oatx_learn_real_"))
    cfg = _cfg(tmp)
    cfg["trainer"]["epochs"] = args.epochs
    cfg["trainer"]["save_period"] = 10 ** 9
    cfg["trainer"]["val_period"] = args.val_period
    cfg["data_loader"][0]["args"]["video_params"]["num_videos"] = args.clips
    exp = ExperimentCfg.from_dict(cfg)
    tok = WordPieceTokenizer.build_from_corpus(
        [f"a dog runs in scene {i}" for i in range(max(args.clips, 20))],
        vocab_size=256)
    train_loaders = build_loaders(exp, tok, split="train")
    val_loaders = build_loaders(exp, tok, split="val")
    tr = Trainer(exp, train_loaders, val_loaders, save_dir=None, log_dir=None)
    print(json.dumps({"platform": jax.default_backend(),
                      "devices": [str(d) for d in jax.devices()],
                      "epochs": args.epochs, "val_period": args.val_period}))
    t0 = time.time()
    hist = tr.train()
    dt = time.time() - t0
    for e in sorted(hist):
        log = hist[e]
        if any(k.startswith("val_") for k in log):
            print(json.dumps({
                "epoch": e,
                "loss": round(log.get("loss_0", float("nan")), 4),
                **{k: round(v, 2) for k, v in log.items()
                   if k.startswith("val_") and isinstance(v, float)}}))
    print(json.dumps({"total_seconds": round(dt, 1),
                      "sec_per_epoch": round(dt / args.epochs, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
