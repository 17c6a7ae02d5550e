"""Input-pipeline race/determinism checker.

The reference has no concurrency-correctness tooling (SURVEY.md §5). This tool
replays one epoch of a configured loader twice with different worker counts and
verifies batches are bit-identical — any data race, unseeded RNG, or
order-dependence in the host pipeline shows up as a diff.

    python tools/check_determinism.py -c configs/smoke/synthetic.json [--split train]
"""

from __future__ import annotations

import argparse
import hashlib
import sys

import numpy as np


def epoch_digest(loader) -> str:
    h = hashlib.sha256()
    for batch in loader:
        for k in sorted(batch):
            v = batch[k]
            if isinstance(v, np.ndarray):
                h.update(k.encode())
                h.update(v.tobytes())
    return h.hexdigest()


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--workers", default="1,8", help="comma list of worker counts")
    args = p.parse_args(argv)

    from oatx.cli.common import dataset_captions, resolve_tokenizer
    from oatx.config.schema import ExperimentCfg
    from oatx.data.factory import build_loaders

    exp = ExperimentCfg.from_json(args.config)
    tok = resolve_tokenizer(exp, corpus=dataset_captions(exp, args.split) or ["a"])

    digests = {}
    for workers in (int(w) for w in args.workers.split(",")):
        for dl in exp.data_loaders:
            dl.num_workers = workers
        loaders = build_loaders(exp, tok, split=args.split)
        for li, loader in enumerate(loaders):
            loader.set_epoch(0)
            digests.setdefault(li, {})[workers] = epoch_digest(loader)

    ok = True
    for li, by_workers in digests.items():
        uniq = set(by_workers.values())
        status = "OK" if len(uniq) == 1 else "MISMATCH"
        ok &= len(uniq) == 1
        print(f"loader {li}: {status} "
              + " ".join(f"workers={w}:{d[:12]}" for w, d in by_workers.items()))
    print("DETERMINISTIC" if ok else "NON-DETERMINISTIC — data race or unseeded RNG")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
