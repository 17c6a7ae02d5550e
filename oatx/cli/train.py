"""Training entry point (reference train.py / train_dist_multi.py /
train_dist_multi_global_local.py / train_dist_region_mem.py unified — the model
variant comes from the config's arch.variant instead of separate scripts).

    python -m oatx.cli.train -c configs/pt/cc3m_webvid/norm.json [--lr ... --bs ...]
    python -m oatx.cli.train -r exps/.../checkpoint-epoch5        # resume

Single-program: run once per host (multi-host TPU pods initialize
jax.distributed automatically under the TPU runtime); the mesh spans all
devices and the loader shards by process index.
"""

from __future__ import annotations

import sys
from typing import Optional, Sequence

import jax

from oatx.config.parser import load_experiment
from oatx.cli.common import dataset_captions, resolve_tokenizer
from oatx.data.factory import build_loaders
from oatx.train.trainer import Trainer
from oatx.utils.logging import setup_logging


def main(argv: Optional[Sequence[str]] = None) -> int:
    import os

    if os.environ.get("OATX_MULTIHOST") == "1":
        # multi-host pod: coordinator/process info from the TPU runtime env,
        # or explicit $OATX_COORDINATOR/$OATX_NUM_PROCESSES/$OATX_PROCESS_ID
        # (manual launch, e.g. the 2-process CPU test in
        # tests/test_multiprocess_e2e.py — reference train_dist_multi.py:35-38
        # reads MASTER_ADDR/RANK/WORLD_SIZE the same way, :127-140)
        coord = os.environ.get("OATX_COORDINATOR")
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=(int(os.environ["OATX_NUM_PROCESSES"])
                           if coord else None),
            process_id=(int(os.environ["OATX_PROCESS_ID"]) if coord else None))
    from oatx.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    exp = load_experiment(argv)
    logger = setup_logging(exp.log_dir, "oatx", exp.cfg.trainer.verbosity)
    logger.info("experiment %s → %s", exp.cfg.name, exp.save_dir)
    logger.info("devices: %s", jax.devices())

    search = [exp.resume.parent] if exp.resume else []
    tokenizer = resolve_tokenizer(exp.cfg, corpus=lambda: dataset_captions(exp.cfg),
                                  search_dirs=search)
    if jax.process_index() == 0:
        # persist the exact vocab with the checkpoints: eval/finetune runs must
        # tokenize identically or the text embeddings are silently garbage
        tokenizer.save_vocab(str(exp.save_dir / "vocab.txt"))
    shard_id, num_shards = jax.process_index(), jax.process_count()
    train_loaders = build_loaders(
        exp.cfg, tokenizer, split="train",
        shard_id=shard_id, num_shards=num_shards, seed=exp.cfg.trainer.seed)
    try:
        valid_loaders = build_loaders(
            exp.cfg, tokenizer, split="val",
            shard_id=shard_id, num_shards=num_shards, seed=exp.cfg.trainer.seed)
    except Exception as e:  # no validation split available
        logger.info("no validation loaders (%s)", e)
        valid_loaders = []

    from oatx.utils.tracking import ExperimentTracker

    track = bool(getattr(exp.args, "observe", False)) or \
        bool(exp.cfg.raw.get("trainer", {}).get("neptune", False))
    with ExperimentTracker(exp.log_dir, exp.cfg.name, config=exp.cfg.raw,
                           enabled=track and jax.process_index() == 0) as tracker:
        trainer = Trainer(
            exp.cfg, train_loaders, valid_loaders,
            save_dir=exp.save_dir, log_dir=exp.log_dir,
            linear_eval=bool(getattr(exp.args, "linear_eval", False)),
            resume=str(exp.resume) if exp.resume else None,
            tracker=tracker,
        )
        trainer.train()
    return 0


if __name__ == "__main__":
    sys.exit(main())
