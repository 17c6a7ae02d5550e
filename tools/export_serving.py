"""Export an AOT serving artifact (jax.export / StableHLO).

    python tools/export_serving.py -c <config.json> [-r <ckpt>] --out <dir> \
        [--canon 256] [--seq-len 30] [--platforms cpu,tpu]

Packages the dual-tower embedding functions + weights into a self-contained
directory (oatx.serve.export): batch-dim-symbolic StableHLO that a production
server runs WITHOUT the oatx model code, lowered for both CPU and TPU where
the installed jax supports cross-platform export. Serve it with:

    python -m oatx.cli.serve -c <config.json> --artifact <dir>

(the config is still read for the tokenizer; the model/checkpoint are not.)
"""

from __future__ import annotations

import argparse
import sys

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main(argv=None) -> int:
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--out", required=True)
    pre.add_argument("--canon", type=int, default=256,
                     help="canonical uint8 frame side the loader ships")
    pre.add_argument("--seq-len", type=int, default=30)
    pre.add_argument("--platforms", default=None,
                     help="comma list, e.g. cpu,tpu (default: try both, "
                          "fall back to the native platform)")
    pre.add_argument("--quantize", default=None, choices=["int8"],
                     help="weight-only per-channel int8 kernels: ~4x smaller "
                          "artifact, dequantize baked into the graphs "
                          "(oatx.serve.quant)")
    our, rest = pre.parse_known_args(argv)

    import jax

    from oatx.config.parser import load_experiment
    from oatx.config.schema import build_tower_config
    from oatx.models import towers
    from oatx.serve.export import save_artifact
    from oatx.train import checkpoint as ckptlib
    from oatx.utils.logging import setup_logging

    exp = load_experiment(rest, test=True)
    logger = setup_logging(None, "oatx.export", exp.cfg.trainer.verbosity)
    import jax.numpy as jnp

    tower_cfg = build_tower_config(
        exp.cfg.arch,
        compute_dtype=jnp.bfloat16 if exp.cfg.trainer.precision == "bf16"
        else jnp.float32)
    params = towers.init(jax.random.PRNGKey(0), tower_cfg)
    ckpt = str(exp.resume) if exp.resume else exp.cfg.arch.load_checkpoint
    if ckpt:
        logger.info("importing weights from %s", ckpt)
        params = ckptlib.import_initial_weights(ckpt, tower_cfg, params)

    platforms = tuple(our.platforms.split(",")) if our.platforms else None
    out = save_artifact(
        our.out, params, tower_cfg,
        frames=exp.cfg.arch.video_params.num_frames,
        canon=our.canon, seq_len=our.seq_len, platforms=platforms,
        quantize=our.quantize)
    import json

    meta = json.loads((out / "meta.json").read_text())
    sizes = {p.name: p.stat().st_size for p in sorted(out.iterdir())}
    logger.info("artifact at %s platforms=%s quantize=%s files=%s",
                out, meta["platforms"], meta.get("quantize"), sizes)
    print(json.dumps({"artifact": str(out), "platforms": meta["platforms"],
                      "quantize": meta.get("quantize"),
                      "bytes": sum(sizes.values())}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
