"""Regenerate the region memory bank (reference `clip_objects_tensor.pt`,
absent from the reference repo — SURVEY.md §2 'Region memory bank').

The bank is a (num_classes, dim) matrix of text embeddings of the BUTD object
vocabulary, indexed by class id at data-loading time
(oatx.data.objects.RegionMemoryBank). Preference order:

  1. real CLIP text encoder, if openai-CLIP/open_clip + weights are available
     on this host (reproduces the reference's 512-d bank);
  2. the oatx DistilBERT text tower with an imported checkpoint (pass --ckpt);
  3. hermetic fallback: the oatx text tower at random init (documented — only
     for smoke/pipeline runs).

Usage:
  python tools/build_region_memory.py --vocab OATrans/utils/objects_vocab.txt \
      --out region_memory.npy [--ckpt model.pth] [--dim 512]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def encode_with_clip(names, dim):
    import clip  # type: ignore
    import torch

    model, _ = clip.load("ViT-B/32", device="cpu")
    with torch.no_grad():
        tokens = clip.tokenize([f"a photo of a {n}" for n in names])
        emb = model.encode_text(tokens).float().numpy()
    return emb[:, :dim]


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
    return emb[:, :dim]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--vocab", required=True, help="objects_vocab.txt path")
    p.add_argument("--out", required=True, help="output .npy")
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--ckpt", default=None, help="torch text-tower checkpoint")
    args = p.parse_args(argv)

    from oatx.data.objects import load_object_vocab

    names = load_object_vocab(args.vocab)[1:]  # drop __background__
    try:
        emb = encode_with_clip(names, args.dim)
        src = "clip"
    except Exception:
        emb = encode_with_oatx_text_tower(names, args.dim, args.ckpt)
        src = "oatx-text-tower" + ("(random init!)" if not args.ckpt else "")
    np.save(args.out, emb.astype(np.float32))
    print(f"wrote {args.out}: {emb.shape} from {src}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
