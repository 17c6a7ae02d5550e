"""Shared CLI wiring."""

from __future__ import annotations

import os
from typing import List, Optional

from oatx.config.schema import ExperimentCfg
from oatx.data.tokenizer import WordPieceTokenizer, load_tokenizer


def resolve_tokenizer(
    exp: ExperimentCfg,
    corpus: Optional[List[str]] = None,
    search_dirs: Optional[List[str]] = None,
) -> WordPieceTokenizer:
    """Tokenizer resolution order:
      1. a vocab.txt in `search_dirs` (checkpoint dirs — the vocab the weights
         were trained with; cli.train persists it there);
      2. top-level config key "tokenizer": {"vocab": <path>};
      3. a vocab.txt next to arch.text_params.model (HF-layout dir);
      4. hermetic fallback — build a vocab from the training captions (synthetic
         and smoke runs; deterministic)."""
    for d in search_dirs or []:
        vp = os.path.join(str(d), "vocab.txt")
        if os.path.exists(vp):
            return load_tokenizer(vp)
    tok_cfg = exp.raw.get("tokenizer", {})
    vocab = tok_cfg.get("vocab")
    if vocab and os.path.exists(vocab):
        return load_tokenizer(vocab)
    model_dir = exp.arch.text_params.model
    if os.path.isdir(model_dir) and os.path.exists(os.path.join(model_dir, "vocab.txt")):
        return load_tokenizer(model_dir)
    if corpus:
        return WordPieceTokenizer.build_from_corpus(corpus, vocab_size=int(tok_cfg.get("vocab_size", 30522)))
    raise FileNotFoundError(
        "no tokenizer vocab: set config key tokenizer.vocab or make "
        "arch.text_params.model a directory containing vocab.txt")


def dataset_captions(exp: ExperimentCfg, split: str = "train", limit: int = 200_000) -> List[str]:
    """Collect captions from the configured datasets (for the hermetic tokenizer
    fallback)."""
    from oatx.data.factory import build_dataset

    texts: List[str] = []
    for dl in exp.data_loaders:
        try:
            ds = build_dataset(dl, "baseline", split)
        except Exception:
            continue
        import numpy as np

        rng = np.random.default_rng(0)
        for rec in ds.metadata[: limit // max(1, len(exp.data_loaders))]:
            try:
                texts.append(ds._get_caption(rec, rng))
            except Exception:
                pass
    return texts
