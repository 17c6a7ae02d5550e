"""Hermetic end-to-end demo of the full object-aware pipeline — no datasets, no
weights, no network:

  1. synthesize a tiny video corpus (native MJPEG writer);
  2. offline object extraction (StubDetector) → per-frame npz;
  3. build a region memory bank from the oatx text tower;
  4. train the region_mem variant for a few epochs;
  5. evaluate retrieval + export region binary maps + HTML gallery + heatmap.

    python tools/demo_e2e.py --out /tmp/oatx_demo [--epochs 2]

Everything lands under --out; open index.html / region_maps/ / heatmaps/.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/oatx_demo")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--clips", type=int, default=16)
    args = p.parse_args(argv)

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    import numpy as np

    from oatx.config.schema import ExperimentCfg
    from oatx.data import extraction as ex
    from oatx.data import video_reader as vr
    from oatx.data.factory import build_dataset, build_loaders, load_region_bank
    from oatx.data.loader import Collator, ShardedLoader
    from oatx.data.tokenizer import WordPieceTokenizer
    from oatx.train.trainer import Trainer

    # 1. corpus ------------------------------------------------------------
    nouns = ["dog", "cat", "car", "tree", "person", "bird", "boat", "horse"]
    vids_dir = out / "videos"
    vids_dir.mkdir(exist_ok=True)
    items = []
    for i in range(args.clips):
        vid = f"clip{i:04d}"
        path = vids_dir / f"{vid}.avi"
        if not path.exists():
            vr.write_test_video(str(path), 160, 120, 24 + (i % 4) * 8, 8)
        items.append((vid, str(path)))
    print(f"[1/5] corpus: {len(items)} clips → {vids_dir}")

    # 2. offline extraction --------------------------------------------------
    stats = ex.extract_dataset(items, str(out / "objects"), ex.StubDetector(),
                               num_workers=4)
    print(f"[2/5] extraction: {json.dumps(stats)}")

    # 3. region memory bank (oatx text tower over a synthetic class vocab) ---
    bank_path = out / "region_memory.npy"
    import jax
    import jax.numpy as jnp

    from oatx.models import distilbert as dbert

    tok = WordPieceTokenizer.build_from_corpus(
        [f"a {n} moves in scene {i}" for n in nouns for i in range(10)], vocab_size=512)
    tcfg = dbert.DistilBertConfig(vocab_size=512, max_position_embeddings=16,
                                  dim=64, hidden_dim=128, n_layers=1, n_heads=2)
    tparams = dbert.init(jax.random.PRNGKey(0), tcfg)
    names = [f"class {i}" for i in range(1600)]
    enc = tok([n for n in names[:64]], max_length=8)
    emb = np.asarray(dbert.apply(tparams, tcfg, jnp.array(enc["input_ids"]),
                                 jnp.array(enc["attention_mask"]))[:, 0])
    bank = np.tile(emb, (25, 1))[:1600]
    bank = np.pad(bank, ((0, 0), (0, 512 - bank.shape[1]))).astype(np.float32)
    np.save(bank_path, bank)
    print(f"[3/5] region memory bank: {bank.shape} → {bank_path}")

    # 4. train region_mem ----------------------------------------------------
    exp = ExperimentCfg.from_dict({
        "name": "demo-region-mem",
        "arch": {"type": "FrozenInTime", "variant": "region_mem", "args": {
            "video_params": {"model": "SpaceTimeTransformer", "num_frames": 2,
                             "input_res": 32, "embed_dim": 48, "depth": 2,
                             "num_heads": 2, "time_init": "zeros",
                             "pretrained": False},
            "text_params": {"model": "distilbert-base-uncased", "pretrained": False,
                            "vocab_size": 512, "dim": 48, "hidden_dim": 96,
                            "n_layers": 1, "n_heads": 2},
            "projection_dim": 16, "load_checkpoint": ""}},
        "data_loader": [{"type": "x", "args": {
            "dataset_name": "SyntheticVideoText",
            "data_dir": str(vids_dir), "object_dir": str(out / "objects"),
            "batch_size": 8, "num_workers": 4, "split": "train",
            "object_params": {"num_mask_objects": 3, "top_k": 5,
                              "region_memory_path": str(bank_path)},
            "video_params": {"input_res": 32, "num_frames": 2,
                             "num_videos": args.clips, "loading": "lax"}}}],
        "optimizer": {"type": "AdamW", "args": {"lr": 1e-3}},
        "loss": {"type": "NormSoftmaxLoss"},
        "metrics": ["t2v_metrics", "v2t_metrics"],
        "trainer": {"epochs": args.epochs, "save_dir": str(out / "exps"),
                    "save_period": args.epochs, "monitor": "off",
                    "init_val": False, "precision": "f32", "verbosity": 1},
    })
    # tiny tower: tap region features at layer 1
    import dataclasses

    loaders = build_loaders(exp, tok)
    tr = Trainer(exp, loaders, [], save_dir=str(out / "exps"), log_dir=None)
    video = dataclasses.replace(tr.tower_cfg.video, region_tap_layer=1)
    object.__setattr__(tr.tower_cfg, "video", video)
    from oatx.models import towers
    from oatx.train import step as steplib

    params = towers.init(jax.random.PRNGKey(0), tr.tower_cfg)
    tr.state = steplib.init_state(jax.random.PRNGKey(0), tr.tower_cfg,
                                  tr.optimizer, params=params)
    tr.train_step = steplib.make_train_step(tr.tower_cfg, tr.loss_cfg,
                                            tr.optimizer, augment=tr.augment)
    tr.eval_step = steplib.make_eval_step(tr.tower_cfg)
    hist = tr.train()
    print(f"[4/5] trained {args.epochs} epochs; last loss "
          f"{hist[args.epochs]['loss_0']:.4f}")

    # 5. eval + visual exports ----------------------------------------------
    from oatx.eval.retrieval_eval import evaluate, export_region_maps
    from oatx.utils.html_viz import RetrievalVis
    from oatx.visualization.heatmap import render_caption_heatmaps

    ds = build_dataset(exp.data_loaders[0], "region_mem", "test",
                       load_region_bank(exp))
    loader = ShardedLoader(ds, batch_size=8, collate=Collator(tok, max_text_len=12),
                           shuffle=False, drop_last=True, num_workers=4)
    res = evaluate(tr.state.params, tr.tower_cfg, loader)
    print("[5/5] retrieval:", {k: round(v, 1) for k, v in
                               res.metrics["t2v_metrics"].items()})
    maps = export_region_maps(tr.state.params, tr.tower_cfg, loader,
                              str(out / "region_maps"), limit=4)
    vis = RetrievalVis(str(out), title="oatx demo", top_k=3)
    caps = [m["raw_captions"] for m in res.meta]
    paths = [str(vids_dir / m["paths"]) for m in res.meta]
    vis.from_sims(res.sims, caps, paths)
    gallery = vis.write()

    frame = vr.decode_indices(items[0][1], [5], short_side=256)[0][:224, :224]
    rng = np.random.default_rng(0)
    heat = render_caption_heatmaps(
        caps[0], [rng.standard_normal(16) for _ in caps[0].split()],
        rng.standard_normal((4, 16)), frame, str(out / "heatmap"))
    print(json.dumps({"gallery": gallery, "region_maps": maps,
                      "heatmaps": heat, "checkpoints": str(out / "exps")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
