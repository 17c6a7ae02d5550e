"""Cross-modality visualization entry point (the reference Visualization
sidecar's main_img/main_video drivers).

    python -m oatx.cli.visualize -c <config.json> [-r <ckpt>] \
        --video path.mp4 --caption "a dog runs" --out out_prefix

Renders per-noun word→patch attention heatmaps of the caption over the clip's
first sampled frame, using the configured towers.
"""

from __future__ import annotations

import argparse
import sys
from typing import Optional, Sequence

import numpy as np


def main(argv: Optional[Sequence[str]] = None) -> int:
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--video")
    p.add_argument("--caption")
    p.add_argument("--out", default="heatmap")
    p.add_argument("--frame-index", type=int, default=None,
                   help="absolute frame to visualize (default: middle)")
    # the reference viz drivers offer a CLIP backbone alongside the trained
    # towers (main_img.py:12 model_se ∈ {'frozen','clip'}); --backbone clip
    # renders from a first-party CLIP (models/clip_vision.py + clip_text.py)
    p.add_argument("--backbone", choices=["tower", "clip"], default="tower")
    p.add_argument("--clip-ckpt",
                   help="CLIP state_dict .pt/.pth (required for --backbone clip)")
    p.add_argument("--bpe-vocab",
                   help="CLIP BPE vocab file (bpe_simple_vocab_16e6.txt.gz)")
    our, rest = p.parse_known_args(argv)
    want_help = "-h" in (rest or []) or "--help" in (rest or [])
    if not want_help:
        if not our.video or not our.caption:
            p.error("--video and --caption are required")
        if our.backbone == "clip" and not our.clip_ckpt:
            p.error("--backbone clip requires --clip-ckpt")
        if our.backbone == "clip":
            return _main_clip(our)
    elif our.backbone == "clip":
        # the clip path has no downstream config parser to print help
        p.print_help()
        return 0

    import jax
    import jax.numpy as jnp

    from oatx.cli.common import dataset_captions, resolve_tokenizer
    from oatx.config.parser import load_experiment
    from oatx.config.schema import build_tower_config
    from oatx.data import video_reader as vr
    from oatx.data.transforms import host_canonicalize
    from oatx.models import towers
    from oatx.train import checkpoint as ckptlib
    from oatx.train.step import make_augmenter
    from oatx.utils.logging import setup_logging
    from oatx.visualization.heatmap import render_caption_heatmaps

    exp = load_experiment(rest, test=True)
    logger = setup_logging(None, "oatx.visualize")
    tower_cfg = build_tower_config(exp.cfg.arch)
    params = towers.init(jax.random.PRNGKey(0), tower_cfg)
    ckpt = str(exp.resume) if exp.resume else exp.cfg.arch.load_checkpoint
    if ckpt:
        params = ckptlib.import_initial_weights(ckpt, tower_cfg, params)
    else:
        logger.warning("no checkpoint — visualizing RANDOM weights")
    tokenizer = resolve_tokenizer(
        exp.cfg, corpus=lambda: (dataset_captions(exp.cfg) or [our.caption]) + [our.caption])

    # decode + canonicalize the frame
    vlen, _, _, _ = vr.probe(our.video)
    idx = our.frame_index if our.frame_index is not None else vlen // 2
    frame_u8 = host_canonicalize(
        vr.decode_indices(our.video, [idx], short_side=256), 256)

    # patch embeddings of the frame (1-frame tower pass)
    aug = make_augmenter(train=False, tower_cfg=tower_cfg)
    fb = aug(jax.random.PRNGKey(0), {"video": jnp.asarray(frame_u8)[None]})
    vout = towers.compute_video(params, tower_cfg, fb["video"])
    patch_embeds = np.asarray(vout["patches"][0], np.float32)

    # per-word text embeddings (reference queries its text model per word,
    # visualize.py:150-152)
    words = our.caption.split(" ")
    word_embeds = []
    for w in words:
        tok = tokenizer([w], max_length=8)
        emb = towers.compute_text(params, tower_cfg,
                                  jnp.asarray(tok["input_ids"]),
                                  jnp.asarray(tok["attention_mask"]))
        word_embeds.append(np.asarray(emb[0], np.float32))

    # project patches into the shared space for comparable dot products
    # (towers._vid_proj also handles the projection='' identity config)
    from oatx.models import towers as _towers

    patch_proj = np.asarray(
        _towers._vid_proj(params, tower_cfg, jnp.asarray(patch_embeds)),
        np.float32)

    disp = np.asarray(jax.image.resize(
        jnp.asarray(frame_u8[0], jnp.float32), (224, 224, 3), "bilinear"), np.uint8)
    paths = render_caption_heatmaps(our.caption, word_embeds, patch_proj,
                                    disp, our.out)
    for path in paths:
        logger.info("wrote %s", path)
    print("\n".join(paths))
    return 0


# CLIP input normalization (reference clip.py _transform / OpenAI constants)
_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _main_clip(our) -> int:
    """--backbone clip: per-noun heatmaps from the first-party CLIP towers —
    the reference's model_se='clip' mode (main_img.py:17-33: per-patch image
    embeddings from the modified VisionTransformer forward, per-word
    clip.tokenize + encode_text queries)."""
    import jax
    import jax.numpy as jnp

    from oatx.data import video_reader as vr
    from oatx.data.clip_tokenizer import ClipTokenizer
    from oatx.data.transforms import host_canonicalize
    from oatx.models import clip_text as ct
    from oatx.models import clip_vision as cv
    from oatx.models import convert
    from oatx.utils.logging import setup_logging
    from oatx.visualization.heatmap import render_caption_heatmaps

    logger = setup_logging(None, "oatx.visualize")
    sd = convert.load_torch_checkpoint(our.clip_ckpt)
    vparams, vcfg = convert.clip_vision_from_torch(sd)
    tparams, tcfg = convert.clip_text_from_torch(sd)
    tokenizer = ClipTokenizer(our.bpe_vocab) if our.bpe_vocab else ClipTokenizer()

    vlen, _, _, _ = vr.probe(our.video)
    idx = our.frame_index if our.frame_index is not None else vlen // 2
    frame_u8 = host_canonicalize(
        vr.decode_indices(our.video, [idx], short_side=256), 256)[0]

    res = vcfg.input_resolution
    img = jax.image.resize(jnp.asarray(frame_u8, jnp.float32) / 255.0,
                           (res, res, 3), "bilinear")
    img = (img - jnp.asarray(_CLIP_MEAN)) / jnp.asarray(_CLIP_STD)
    patch_embeds = np.asarray(
        cv.encode_image_patches(vparams, vcfg, img[None])[0], np.float32)

    words = our.caption.split(" ")
    word_embeds = []
    for w in words:
        ids = tokenizer.tokenize([w], context_length=tcfg.context_length)
        emb = ct.encode_text(tparams, tcfg, jnp.asarray(ids))
        word_embeds.append(np.asarray(emb[0], np.float32))

    disp = np.asarray(jax.image.resize(
        jnp.asarray(frame_u8, jnp.float32), (224, 224, 3), "bilinear"), np.uint8)
    paths = render_caption_heatmaps(our.caption, word_embeds, patch_embeds,
                                    disp, our.out)
    for path in paths:
        logger.info("wrote %s", path)
    print("\n".join(paths))
    return 0


if __name__ == "__main__":
    sys.exit(main())
