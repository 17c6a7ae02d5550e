"""Build a serving retrieval index from a config's eval split.

    python tools/build_index.py -c <config.json> [-r <ckpt>] \
        [--split test] [--sliding_window_stride 8] --index-out corpus.npz

Embeds the split's videos through the same eval pipeline that produces the
reported retrieval metrics (oatx.eval.retrieval_eval.evaluate — chunked eval
step, optional sliding-window ensembling), then persists one L2-normalized
embedding per video keyed by its clip path. Serve it with:

    python -m oatx.cli.serve -c <config.json> [-r <ckpt>] --index corpus.npz
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main(argv=None) -> int:
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--index-out", required=True)
    our, rest = pre.parse_known_args(argv)

    import jax

    from oatx.cli.common import dataset_captions, resolve_tokenizer
    from oatx.config.parser import load_experiment
    from oatx.config.schema import build_tower_config
    from oatx.data.factory import build_dataset, load_region_bank
    from oatx.data.loader import Collator, ShardedLoader
    from oatx.eval.retrieval_eval import evaluate
    from oatx.models import towers
    from oatx.parallel import mesh as meshlib
    from oatx.parallel import sharding as shardlib
    from oatx.serve.retrieval_index import RetrievalIndex, ids_for_result
    from oatx.train import checkpoint as ckptlib
    from oatx.utils.compile_cache import enable as _enable_cache
    from oatx.utils.logging import setup_logging

    _enable_cache()
    exp = load_experiment(rest, test=True)
    logger = setup_logging(None, "oatx.build_index", exp.cfg.trainer.verbosity)
    split = exp.args.split or "test"
    import jax.numpy as jnp

    tower_cfg = build_tower_config(
        exp.cfg.arch,
        compute_dtype=jnp.bfloat16 if exp.cfg.trainer.precision == "bf16"
        else jnp.float32)
    mesh = meshlib.make_mesh(model_parallel=exp.cfg.trainer.model_parallel)
    params = towers.init(jax.random.PRNGKey(0), tower_cfg)
    ckpt = str(exp.resume) if exp.resume else exp.cfg.arch.load_checkpoint
    if ckpt:
        logger.info("loading weights from %s", ckpt)
        params = ckptlib.import_initial_weights(ckpt, tower_cfg, params)
    else:
        logger.warning("no checkpoint given — indexing RANDOM weights")
    params = shardlib.shard_params(mesh, params)

    search = []
    if ckpt:
        import pathlib

        search.append(pathlib.Path(ckpt).parent)
    tokenizer = resolve_tokenizer(
        exp.cfg, corpus=lambda: dataset_captions(exp.cfg, split) or ["a video"],
        search_dirs=search)
    dl = exp.cfg.data_loaders[0]
    ds = build_dataset(dl, exp.cfg.arch.variant, split,
                       load_region_bank(exp.cfg), seed=exp.cfg.trainer.seed)
    stride = exp.args.sliding_window_stride
    if stride != -1:
        logger.info("sliding-window ensembling, stride %d", stride)
        ds.expand_sliding_windows(stride)
    loader = ShardedLoader(
        ds, batch_size=dl.batch_size, collate=Collator(tokenizer),
        shuffle=False, drop_last=False, num_workers=dl.num_workers)

    t0 = time.perf_counter()
    result = evaluate(params, tower_cfg, loader, metric_names=(), mesh=mesh)
    ids = ids_for_result(result)
    index = RetrievalIndex(result.video_embeds, ids)
    index.save(our.index_out)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "index": our.index_out, "videos": len(index), "dim": index.dim,
        "dataset": ds.dataset_name, "split": split,
        "clips_per_sec": round(len(index) / dt, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
