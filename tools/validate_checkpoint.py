"""Real-checkpoint validation: torch .pth vs the oatx import, cosine manifest.

    python tools/validate_checkpoint.py --ckpt model_best.pth \
        [--variant baseline|global_local|region_mem] [--num-frames 4] \
        [--threshold 0.999] [--json manifest.json]

The zero-egress dev image has no pretrained weights, so all parity here is
proven against random-weight oracles (tests/). This tool is the one-command
runbook step for the day a host has the real reference checkpoints
(docs/real_weights.md): it

  1. imports the REFERENCE's own model code (/root/reference, timm-stubbed)
     and loads the .pth into it (state_dict_data_parallel_fix semantics);
  2. imports the same .pth into oatx via convert.frozen_in_time_from_torch
     (the exact path cli.train/test use for arch.load_checkpoint);
  3. runs both stacks on deterministic synthetic inputs and reports the
     per-stream embedding cosine.

Exit code 0 iff every stream's cosine >= --threshold (BASELINE.md north star:
>= 0.999). Works on any .pth in the reference key schema, including random
ones — tests/test_aux_components.py exercises it end-to-end.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _install_timm_stub():
    """timm is not installed; stub the 3 symbols the reference imports
    (mirror of tests/torch_oracles.py — duplicated so the tool ships alone)."""
    if "timm" in sys.modules:
        return
    import torch.nn as nn
    from importlib.machinery import ModuleSpec

    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = nn.Identity  # eval-only: drop path is identity
    layers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
    layers.trunc_normal_ = lambda t, **kw: nn.init.trunc_normal_(t, **kw)
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    models.layers = layers
    timm.models = models
    for name, mod in (("timm", timm), ("timm.models", models),
                      ("timm.models.layers", layers)):
        mod.__spec__ = ModuleSpec(name, loader=None)
        sys.modules[name] = mod


def _load_reference_video_transformer(path):
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"reference video_transformer not found at {path} — pass --reference")
    _install_timm_stub()
    spec = importlib.util.spec_from_file_location("ref_vt", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _cos(a, b):
    import numpy as np

    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="torch .pth in the reference schema")
    p.add_argument("--variant", default="baseline",
                   choices=["baseline", "global_local", "region_mem"])
    p.add_argument("--num-frames", type=int, default=4)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--embed-dim", type=int, default=768)
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--num-heads", type=int, default=12)
    p.add_argument("--projection-dim", type=int, default=256)
    p.add_argument("--threshold", type=float, default=0.999)
    p.add_argument("--temporal-fix", default="zeros",
                   choices=["zeros", "interp", "bilinear"])
    p.add_argument("--json", default=None, help="write the manifest here too")
    p.add_argument("--reference",
                   default="/root/reference/OATrans/model/video_transformer.py")
    args = p.parse_args(argv)

    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from oatx.models import convert, distilbert as dbert, towers
    from oatx.models import vit_spacetime as vst

    sd = convert.load_torch_checkpoint(args.ckpt)

    # ---- reference torch stack, checkpoint loaded
    ref = _load_reference_video_transformer(args.reference)
    from transformers import DistilBertConfig, DistilBertModel

    torch.manual_seed(0)
    video_model = ref.SpaceTimeTransformer(
        img_size=args.img_size, embed_dim=args.embed_dim, depth=args.depth,
        num_heads=args.num_heads, num_frames=args.num_frames,
        time_init="random", attention_style="frozen-in-time")
    video_model.head = torch.nn.Identity()
    video_model.pre_logits = torch.nn.Identity()
    text_dim = sd["text_model.embeddings.word_embeddings.weight"].shape[1] \
        if "text_model.embeddings.word_embeddings.weight" in sd else 768
    n_text_layers = 1 + max(
        (int(k.split(".")[3]) for k in sd if k.startswith("text_model.transformer.layer.")),
        default=5)
    text_model = DistilBertModel(DistilBertConfig(
        dim=text_dim, hidden_dim=4 * text_dim, n_layers=n_text_layers,
        n_heads=max(1, text_dim // 64)))
    pdim = args.projection_dim
    txt_proj = torch.nn.Sequential(torch.nn.ReLU(), torch.nn.Linear(text_dim, pdim))
    vid_proj = torch.nn.Sequential(torch.nn.Linear(args.embed_dim, pdim))

    missing = []
    for prefix, m in (("video_model.", video_model), ("text_model.", text_model),
                      ("txt_proj.", txt_proj), ("vid_proj.", vid_proj)):
        sub = {k[len(prefix):]: torch.as_tensor(v) for k, v in sd.items()
               if k.startswith(prefix)}
        res = m.load_state_dict(sub, strict=False)
        missing += [prefix + k for k in res.missing_keys]
        m.eval()
    if missing:
        print(f"WARNING: {len(missing)} keys missing from checkpoint "
              f"(first: {missing[:4]})", file=sys.stderr)

    # ---- oatx import of the same checkpoint
    video_cfg = vst.SpaceTimeViTConfig(
        img_size=args.img_size, embed_dim=args.embed_dim, depth=args.depth,
        num_heads=args.num_heads, num_frames=args.num_frames, time_init="random")
    text_cfg = dbert.DistilBertConfig(dim=text_dim, hidden_dim=4 * text_dim,
                                      n_layers=n_text_layers,
                                      n_heads=max(1, text_dim // 64))
    tower_cfg = towers.TowerConfig(video=video_cfg, text=text_cfg,
                                   projection_dim=pdim, variant=args.variant)
    fresh = towers.init(jax.random.PRNGKey(0), tower_cfg)
    params = dict(fresh)
    params.update(convert.frozen_in_time_from_torch(
        sd, video_cfg, text_cfg, fresh_video_params=fresh["video"],
        temporal_fix=args.temporal_fix))

    # ---- deterministic inputs, both stacks, cosine manifest
    rng = np.random.default_rng(123)
    B, F, L = 2, args.num_frames, 16
    video = rng.standard_normal((B, F, args.img_size, args.img_size, 3)).astype(np.float32)
    ids = rng.integers(0, 30522, (B, L))
    mask = np.ones((B, L), np.int64)
    mask[1, 10:] = 0

    with torch.no_grad():
        t_cls, t_patches = video_model.forward_features(
            torch.from_numpy(video.transpose(0, 1, 4, 2, 3)))
        t_vid = vid_proj(t_cls)
        h = text_model(torch.from_numpy(ids),
                       attention_mask=torch.from_numpy(mask)).last_hidden_state
        t_txt = txt_proj(h[:, 0, :])  # model.py:108 CLS pooling

    vout = vst.apply(params["video"], video_cfg, jnp.asarray(video))
    from oatx.ops.layers import linear

    o_vid = linear(params["vid_proj"], vout["cls"])
    o_tok = dbert.apply(params["text"], text_cfg, jnp.asarray(ids), jnp.asarray(mask))
    o_txt = linear(params["txt_proj"], jax.nn.relu(o_tok[:, 0, :]))

    manifest = {
        "video_cls_cosine": _cos(vout["cls"], t_cls.numpy()),
        "video_patches_cosine": _cos(vout["patches"], t_patches.numpy()),
        "video_embed_cosine": _cos(o_vid, t_vid.numpy()),
        "text_tokens_cosine": _cos(o_tok, h.numpy()),
        "text_embed_cosine": _cos(o_txt, t_txt.numpy()),
        "checkpoint": os.path.abspath(args.ckpt),
        "variant": args.variant,
        "threshold": args.threshold,
        "missing_keys": len(missing),
    }
    ok = all(v >= args.threshold for k, v in manifest.items()
             if k.endswith("_cosine"))
    manifest["ok"] = ok
    out = json.dumps(manifest, indent=2)
    print(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
