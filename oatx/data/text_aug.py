"""Text augmentation (reference base_dataset_global_local.py:24-107 +
base_augmentation.py:8-47 equivalents, dependency-free).

EDA-style ops (swap/delete/insert; synonym replacement uses nltk WordNet when
its data is present, else falls back to duplication-insert), object-tag
shuffling, pseudo-class injection, and [MASK]ing. All take an explicit
numpy Generator — the reference uses the global `random` module.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def _synonym(word: str) -> Optional[str]:
    try:
        from nltk.corpus import wordnet

        lemmas = {l.name().replace("_", " ")
                  for s in wordnet.synsets(word) for l in s.lemmas()}
        lemmas.discard(word)
        return sorted(lemmas)[0] if lemmas else None
    except Exception:
        return None


def random_swap(words: List[str], n: int, rng: np.random.Generator) -> List[str]:
    words = list(words)
    for _ in range(n):
        if len(words) < 2:
            break
        i, j = rng.integers(0, len(words), 2)
        words[i], words[j] = words[j], words[i]
    return words


def random_delete(words: List[str], p: float, rng: np.random.Generator) -> List[str]:
    if len(words) <= 1:
        return list(words)
    kept = [w for w in words if rng.uniform() > p]
    return kept or [words[int(rng.integers(0, len(words)))]]


def random_insert(words: List[str], n: int, rng: np.random.Generator) -> List[str]:
    words = list(words)
    for _ in range(n):
        src = words[int(rng.integers(0, len(words)))]
        ins = _synonym(src) or src
        words.insert(int(rng.integers(0, len(words) + 1)), ins)
    return words


def synonym_replace(words: List[str], n: int, rng: np.random.Generator) -> List[str]:
    words = list(words)
    order = rng.permutation(len(words))
    replaced = 0
    for i in order:
        syn = _synonym(words[i])
        if syn:
            words[i] = syn
            replaced += 1
        if replaced >= n:
            break
    return words


def eda(caption: str, rng: Optional[np.random.Generator] = None,
        alpha: float = 0.1) -> str:
    """One random EDA op applied to the caption (reference textaug_eda picks
    among synonym/swap/insert/delete)."""
    rng = rng or np.random.default_rng()
    words = caption.split()
    if not words:
        return caption
    n = max(1, int(alpha * len(words)))
    op = int(rng.integers(0, 4))
    if op == 0:
        words = synonym_replace(words, n, rng)
    elif op == 1:
        words = random_swap(words, n, rng)
    elif op == 2:
        words = random_insert(words, n, rng)
    else:
        words = random_delete(words, alpha, rng)
    return " ".join(words)


def shuffle_object_tags(tags: str, rng: Optional[np.random.Generator] = None) -> str:
    """Shuffle the space-separated object tags (reference shuffle_object)."""
    rng = rng or np.random.default_rng()
    words = tags.split()
    return " ".join(words[i] for i in rng.permutation(len(words)))


def add_pseudo_class(tags: str, vocab: Sequence[str], n: int = 1,
                     rng: Optional[np.random.Generator] = None) -> str:
    """Inject random vocabulary class names among the tags (reference
    add_pseudo_class — a negative-tag regularizer)."""
    rng = rng or np.random.default_rng()
    words = tags.split()
    for _ in range(n):
        cls = vocab[int(rng.integers(0, len(vocab)))]
        words.insert(int(rng.integers(0, len(words) + 1)), cls)
    return " ".join(words)


def mask_words(caption: str, p: float = 0.15, mask_token: str = "[MASK]",
               rng: Optional[np.random.Generator] = None) -> str:
    """Randomly replace words with the mask token (reference '[MASK]'ing)."""
    rng = rng or np.random.default_rng()
    words = [mask_token if rng.uniform() < p else w for w in caption.split()]
    return " ".join(words)
