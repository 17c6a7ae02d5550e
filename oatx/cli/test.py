"""Retrieval eval entry point (reference test.py equivalent).

    python -m oatx.cli.test -c configs/ft/msrvtt/zsl/normal.json \
        [--sliding_window_stride 8] [--split test] [-r <oatx checkpoint>]

Loads weights from -r (oatx snapshot) or arch.load_checkpoint (torch .pth or
snapshot), embeds the eval split, applies sliding-window temporal ensembling
when requested, prints t2v/v2t retrieval metrics.
"""

from __future__ import annotations

import json
import sys
from typing import Optional, Sequence

import jax

from oatx.cli.common import dataset_captions, resolve_tokenizer
from oatx.config.parser import load_experiment
from oatx.config.schema import build_tower_config
from oatx.data.factory import build_dataset, build_loaders, load_region_bank
from oatx.data.loader import Collator, ShardedLoader
from oatx.eval.retrieval_eval import evaluate
from oatx.parallel import mesh as meshlib
from oatx.parallel import sharding as shardlib
from oatx.train import checkpoint as ckptlib
from oatx.train.trainer import verbose
from oatx.utils.logging import setup_logging


def main(argv: Optional[Sequence[str]] = None) -> int:
    from oatx.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    exp = load_experiment(argv, test=True)
    logger = setup_logging(None, "oatx.test", exp.cfg.trainer.verbosity)
    split = exp.args.split or "test"
    stride = exp.args.sliding_window_stride

    import jax.numpy as jnp

    tower_cfg = build_tower_config(
        exp.cfg.arch,
        compute_dtype=jnp.bfloat16 if exp.cfg.trainer.precision == "bf16" else jnp.float32)
    mesh = meshlib.make_mesh(model_parallel=exp.cfg.trainer.model_parallel)

    from oatx.models import towers

    params = towers.init(jax.random.PRNGKey(0), tower_cfg)
    ckpt = str(exp.resume) if exp.resume else exp.cfg.arch.load_checkpoint
    if ckpt:
        use_ema = bool(getattr(exp.args, "ema", False))
        logger.info("loading %sweights from %s", "EMA " if use_ema else "", ckpt)
        params = ckptlib.import_initial_weights(ckpt, tower_cfg, params,
                                                prefer_ema=use_ema)
    else:
        logger.warning("no checkpoint given — evaluating RANDOM weights")
    params = shardlib.shard_params(mesh, params)

    search = []
    if ckpt:  # exp.resume and ckpt resolve to the same dir when -r is given
        import pathlib

        search.append(pathlib.Path(ckpt).parent)
    tokenizer = resolve_tokenizer(exp.cfg, corpus=lambda: dataset_captions(exp.cfg, split),
                                  search_dirs=search)
    dl = exp.cfg.data_loaders[0]
    ds = build_dataset(dl, exp.cfg.arch.variant, split,
                       load_region_bank(exp.cfg), seed=exp.cfg.trainer.seed)
    if stride != -1:
        logger.info("sliding-window ensembling, stride %d", stride)
        ds.expand_sliding_windows(stride)
    if getattr(exp.args, "all_captions", False):
        qpv = ds.expand_eval_captions()
        logger.info("full-cut protocol: %d caption slots per video", qpv)
    tag_lens = None
    if exp.cfg.arch.variant == "global_local":
        # without the per-class token lengths the collator cannot emit
        # object_token_masks and the jitted global_local forward KeyErrors
        from oatx.data.factory import tag_token_lens_for

        tag_lens = tag_token_lens_for(ds, tokenizer)
    loader = ShardedLoader(
        ds, batch_size=dl.batch_size,
        collate=Collator(tokenizer, tag_token_lens=tag_lens),
        shuffle=False, drop_last=False, num_workers=dl.num_workers)

    result = evaluate(params, tower_cfg, loader, exp.cfg.metrics, mesh)
    for name, m in result.metrics.items():
        short = {"t2v_metrics": "t2v", "v2t_metrics": "v2t"}.get(name, name)
        if "R1" in m:
            logger.info(verbose(0, m, ds.dataset_name, short))
        else:  # e.g. mAP — no R@K keys for the verbose line
            logger.info("[%s] %s: %s", short, ds.dataset_name,
                        {k: round(float(v), 3) for k, v in m.items()})
    for stream, ms in result.object_streams.items():
        # stream-3 object streams (reference test.py:287-291 o2v/o2t)
        for name, m in ms.items():
            logger.info(verbose(0, m, f"{ds.dataset_name}[{stream}]",
                                name.replace("_metrics", "")))
            result.metrics[f"{stream}_{name}"] = m

    # multiple-choice datasets (LSMDC_choice): candidate-caption accuracy
    if getattr(ds, "is_multiple_choice", False):
        from oatx.eval.retrieval_eval import evaluate_multiple_choice

        mc = evaluate_multiple_choice(params, tower_cfg, loader, tokenizer)
        logger.info("[mc] %s accuracy %.2f%% (n=%d)", ds.dataset_name,
                    mc["accuracy"], mc["n"])
        result.metrics["multiple_choice"] = mc

    if exp.cfg.arch.variant == "global_local":
        from oatx.eval.retrieval_eval import evaluate_streams

        for stream, ms in evaluate_streams(
                params, tower_cfg, loader, exp.cfg.metrics, mesh).items():
            for name, m in ms.items():
                logger.info(verbose(0, m, f"{ds.dataset_name}[{stream}]",
                                    name.replace("_metrics", "")))

    # qualitative exports (reference test_region_mem.py binary maps + the HTML
    # ranking galleries of utils/visualizer.py)
    if exp.cfg.arch.variant == "region_mem":
        from oatx.eval.retrieval_eval import export_region_maps

        maps_dir = exp.web_dir / "region_maps"
        paths = export_region_maps(params, tower_cfg, loader, str(maps_dir))
        logger.info("wrote %d region binary maps → %s", len(paths), maps_dir)
    if exp.cfg.visualizer.get("type") == "RetrievalVis":
        from oatx.utils.html_viz import RetrievalVis

        vis = RetrievalVis(str(exp.web_dir), title=exp.cfg.name)
        caps = [m_.get("raw_captions", "") for m_ in result.meta]
        vids = [m_.get("paths", "") for m_ in result.meta]
        if caps and vids and result.sims.shape[0] == len(caps):
            vis.from_sims(result.sims, caps, vids)
            logger.info("wrote retrieval gallery → %s", vis.write())

    if getattr(exp.args, "sims_out", None):
        # raw caption×video similarity matrix (reference test.py:284 `sims`) —
        # lets downstream tooling (and the full-pipeline parity test) inspect
        # rank orderings rather than just the aggregated metrics
        import numpy as np

        np.save(exp.args.sims_out, result.sims)
        logger.info("saved sims %s → %s", result.sims.shape, exp.args.sims_out)

    print(json.dumps({n: {k: round(float(v), 3) for k, v in m.items()}
                      for n, m in result.metrics.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
