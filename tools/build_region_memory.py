"""Regenerate the region memory bank (reference `clip_objects_tensor.pt`,
absent from the reference repo — SURVEY.md §2 'Region memory bank';
consumed at base_dataset_region_mem.py:297-305 as 512-d CLIP text embeddings
of the 1599 BUTD classes, indexed by object id).

Backends (--backend, default 'clip'):

  clip    first-party JAX CLIP text encoder (oatx.models.clip_text) — the
          primary path; reproduces the reference's true 512-d bank when given
          real weights via --clip-ckpt (an OpenAI CLIP / vendored-CLIP torch
          state_dict). Without --clip-ckpt the encoder is RANDOM-INIT
          (hermetic; fine for smoke/pipeline runs, loudly labeled).
          Tokenization: the CLIP BPE (pass --bpe or $OATX_CLIP_BPE); when the
          merges file is absent, a synthetic merge table learned from the
          vocab itself keeps the build hermetic (documented divergence).
  torch-clip  external `clip` package + downloaded weights (legacy option).
  distilbert  the oatx DistilBERT text tower (optionally --ckpt), padded or
          truncated to --dim.

Usage:
  python tools/build_region_memory.py --vocab OATrans/utils/objects_vocab.txt \
      --out region_memory.npy [--clip-ckpt clip_vit_b32.pth] [--dim 512]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

PROMPT = "a photo of a {}"


def encode_with_oatx_clip(names, dim, clip_ckpt=None, bpe=None):
    import jax
    import jax.numpy as jnp

    from oatx.data import clip_tokenizer as ctok
    from oatx.models import clip_text as ct

    random_init = clip_ckpt is None
    if clip_ckpt:
        from oatx.models import convert

        params, cfg = convert.clip_text_from_torch(
            convert.load_torch_checkpoint(clip_ckpt))
    else:
        cfg = ct.ClipTextConfig(embed_dim=dim)
        params = ct.init(jax.random.PRNGKey(0), cfg)

    bpe_path = bpe or ctok.default_bpe_path()
    if bpe_path:
        tok = ctok.ClipTokenizer(bpe_path=bpe_path)
        tok_src = "bpe"
    else:
        if not random_init:
            raise SystemExit(
                "--clip-ckpt given but no BPE merges found: real CLIP weights "
                "require the real tokenizer (pass --bpe or set $OATX_CLIP_BPE)")
        tok = ctok.ClipTokenizer.for_tests(
            [PROMPT.format(n) for n in names], extra_merges=512)
        tok_src = "synthetic-bpe"
    f = jax.jit(lambda ids: ct.encode_text(params, cfg, ids))
    out = []
    for i in range(0, len(names), 256):
        ids = tok.tokenize([PROMPT.format(n) for n in names[i: i + 256]],
                           context_length=cfg.context_length, truncate=True)
        ids = np.minimum(ids, cfg.vocab_size - 1)
        out.append(np.asarray(f(jnp.asarray(ids))))
    emb = np.concatenate(out).astype(np.float32)
    if emb.shape[1] < dim:
        emb = np.pad(emb, ((0, 0), (0, dim - emb.shape[1])))
    src = f"oatx-clip[{tok_src}]" + ("(random init!)" if random_init else "")
    return emb[:, :dim], src


def encode_with_torch_clip(names, dim):
    import clip  # type: ignore
    import torch

    model, _ = clip.load("ViT-B/32", device="cpu")
    with torch.no_grad():
        tokens = clip.tokenize([PROMPT.format(n) for n in names])
        emb = model.encode_text(tokens).float().numpy()
    return emb[:, :dim], "torch-clip"


def encode_with_oatx_text_tower(names, dim, ckpt=None):
    import jax
    import jax.numpy as jnp

    from oatx.data.tokenizer import WordPieceTokenizer
    from oatx.models import distilbert as dbert

    cfg = dbert.DistilBertConfig()
    params = dbert.init(jax.random.PRNGKey(0), cfg)
    if ckpt:
        from oatx.models import convert

        sd = convert.load_torch_checkpoint(ckpt)
        params = convert.distilbert_from_torch(sd, cfg)
    tok = WordPieceTokenizer.build_from_corpus(names, vocab_size=8192)
    out = []
    f = jax.jit(lambda ids, mask: dbert.apply(params, cfg, ids, mask)[:, 0])
    for i in range(0, len(names), 256):
        chunk = names[i: i + 256]
        t = tok(chunk, max_length=8)
        out.append(np.asarray(f(jnp.array(t["input_ids"]), jnp.array(t["attention_mask"]))))
    emb = np.concatenate(out)
    if emb.shape[1] < dim:
        emb = np.pad(emb, ((0, 0), (0, dim - emb.shape[1])))
    src = "oatx-text-tower" + ("(random init!)" if not ckpt else "")
    return emb[:, :dim], src


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--vocab", required=True, help="objects_vocab.txt path")
    p.add_argument("--out", required=True, help="output .npy")
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--backend", default="clip",
                   choices=["clip", "torch-clip", "distilbert"])
    p.add_argument("--clip-ckpt", default=None,
                   help="torch CLIP state_dict (.pth/.pt) for the clip backend")
    p.add_argument("--bpe", default=None, help="bpe_simple_vocab_16e6.txt.gz path")
    p.add_argument("--ckpt", default=None, help="torch DistilBERT checkpoint "
                   "(distilbert backend)")
    args = p.parse_args(argv)

    from oatx.data.objects import load_object_vocab

    names = load_object_vocab(args.vocab)[1:]  # drop __background__
    if args.backend == "clip":
        emb, src = encode_with_oatx_clip(names, args.dim, args.clip_ckpt, args.bpe)
    elif args.backend == "torch-clip":
        emb, src = encode_with_torch_clip(names, args.dim)
    else:
        emb, src = encode_with_oatx_text_tower(names, args.dim, args.ckpt)
    np.save(args.out, emb.astype(np.float32))
    print(f"wrote {args.out}: {emb.shape} from {src}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
