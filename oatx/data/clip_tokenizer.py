"""CLIP byte-level BPE tokenizer, pure Python — first-party equivalent of the
reference's vendored `Visualization/.../clip/simple_tokenizer.py:62-132` and
`clip/clip.py:192-228` (tokenize).

Behavioral spec (golden-tested token-for-token against the reference in
tests/test_clip_text.py):
  - GPT-2 byte→unicode table so BPE operates on printable unicode
    (simple_tokenizer.py:15-35);
  - vocab = 256 byte symbols + 256 end-of-word ('</w>') variants + the first
    48894 merges of bpe_simple_vocab_16e6.txt.gz + 2 specials → 49408 ids
    (simple_tokenizer.py:63-77);
  - text is unicode-fixed (ftfy when available — identity for already-clean
    ASCII), html-unescaped twice, whitespace-collapsed, lowercased
    (simple_tokenizer.py:50-59,122);
  - word split regex keeps contractions and letter/number/other runs
    (simple_tokenizer.py:80);
  - greedy lowest-rank pair merging with '</w>' fused onto the last byte
    (simple_tokenizer.py:82-119);
  - tokenize() wraps with <|startoftext|>/<|endoftext|>, zero-pads to
    context_length=77, and on truncate=True keeps eot as the last token
    (clip.py:211-228).

The merges table is DATA, not code: pass `bpe_path` (the standard OpenAI
`bpe_simple_vocab_16e6.txt.gz`), set $OATX_CLIP_BPE, or drop the file under
oatx/assets/. Without it, `ClipTokenizer.for_tests()` builds a miniature
synthetic merge table with identical mechanics for hermetic unit tests.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

SOT = "<|startoftext|>"
EOT = "<|endoftext|>"
CONTEXT_LENGTH = 77
_N_MERGES = 49152 - 256 - 2  # vocab budget of the published CLIP models


@functools.lru_cache()
def byte_unicode_table() -> Dict[int, str]:
    """GPT-2's reversible byte→printable-unicode map: the 188 printable
    latin-1 bytes map to themselves, the rest to U+0100.. in order."""
    keep = (list(range(ord("!"), ord("~") + 1))
            + list(range(ord("\xa1"), ord("\xac") + 1))
            + list(range(ord("\xae"), ord("\xff") + 1)))
    # insertion order = printable bytes first, then the remapped rest — the
    # dict's VALUE order seeds vocab ids 0..255, so it must match upstream
    table = {b: chr(b) for b in keep}
    offset = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + offset)
            offset += 1
    return table


def default_bpe_path() -> Optional[str]:
    env = os.environ.get("OATX_CLIP_BPE")
    if env and os.path.exists(env):
        return env
    here = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "assets", "bpe_simple_vocab_16e6.txt.gz")
    if os.path.exists(here):
        return here
    return None


def _clean_text(text: str) -> str:
    try:  # ftfy fixes mojibake; identity for well-formed text (and absent here)
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    text = html.unescape(html.unescape(text))
    return " ".join(text.split()).strip().lower()


class ClipTokenizer:
    """encode(str) -> List[int]; call tokenize() for padded id arrays."""

    def __init__(self, bpe_path: Optional[str] = None,
                 merges: Optional[List[Tuple[str, str]]] = None):
        if merges is None:
            bpe_path = bpe_path or default_bpe_path()
            if bpe_path is None:
                raise FileNotFoundError(
                    "CLIP BPE merges not found: pass bpe_path, set "
                    "$OATX_CLIP_BPE, or place bpe_simple_vocab_16e6.txt.gz "
                    "under oatx/assets/")
            opener = gzip.open if bpe_path.endswith(".gz") else open
            with opener(bpe_path, "rt", encoding="utf-8") as f:
                lines = f.read().split("\n")
            # line 0 is a version header; cap at the published model's budget
            merges = [tuple(l.split()) for l in lines[1: _N_MERGES + 1] if l.strip()]
        self.byte_encoder = byte_unicode_table()
        base = list(self.byte_encoder.values())
        vocab = base + [c + "</w>" for c in base] + ["".join(m) for m in merges] \
            + [SOT, EOT]
        self.encoder: Dict[str, int] = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.rank: Dict[Tuple[str, str], int] = {m: i for i, m in enumerate(merges)}
        self._cache: Dict[str, List[str]] = {}
        import regex

        self._pat = regex.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+", regex.IGNORECASE)
        self.sot_id = self.encoder[SOT]
        self.eot_id = self.encoder[EOT]

    @classmethod
    def for_tests(cls, corpus: Sequence[str] = (), extra_merges: int = 64):
        """Miniature tokenizer with a synthetic merge table (learned from
        `corpus` by pair frequency) — same mechanics, no 1.3 MB data file."""
        counts: Dict[Tuple[str, str], int] = {}
        table = byte_unicode_table()
        words = [w for text in corpus for w in _clean_text(text).split()]
        vocab_words: Dict[Tuple[str, ...], int] = {}
        for w in words:
            sym = [table[b] for b in w.encode("utf-8")]
            if sym:
                sym[-1] += "</w>"
                vocab_words[tuple(sym)] = vocab_words.get(tuple(sym), 0) + 1
        merges: List[Tuple[str, str]] = []
        for _ in range(extra_merges):
            counts.clear()
            for sym, c in vocab_words.items():
                for a, b in zip(sym, sym[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + c
            if not counts:
                break
            best = max(counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
            merges.append(best)
            new_vocab = {}
            for sym, c in vocab_words.items():
                out, i = [], 0
                while i < len(sym):
                    if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                        out.append(sym[i] + sym[i + 1])
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
            vocab_words = new_vocab
        return cls(merges=merges)

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    def _bpe(self, word_symbols: List[str]) -> List[str]:
        word = list(word_symbols)
        while len(word) > 1:
            pairs = list(zip(word, word[1:]))
            ranked = [(self.rank[p], i) for i, p in enumerate(pairs) if p in self.rank]
            if not ranked:
                break
            best_rank = min(r for r, _ in ranked)
            best_pair = None
            for r, i in ranked:
                if r == best_rank:
                    best_pair = pairs[i]
                    break
            # merge EVERY occurrence of the best pair left-to-right
            out, i = [], 0
            while i < len(word):
                if (i + 1 < len(word)
                        and (word[i], word[i + 1]) == best_pair):
                    out.append(word[i] + word[i + 1])
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = out
        return word

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for tok in self._pat.findall(_clean_text(text)):
            key = tok
            if key not in self._cache:
                if tok in (SOT, EOT):
                    self._cache[key] = [tok]
                else:
                    sym = [self.byte_encoder[b] for b in tok.encode("utf-8")]
                    if not sym:
                        continue
                    sym[-1] += "</w>"
                    self._cache[key] = self._bpe(sym)
            ids.extend(self.encoder[s] for s in self._cache[key])
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        text = "".join(self.decoder[int(i)] for i in ids
                       if int(i) not in (self.sot_id, self.eot_id))
        byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        raw = bytearray(byte_decoder[c] for c in text if c in byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ").strip()

    def tokenize(self, texts, context_length: int = CONTEXT_LENGTH,
                 truncate: bool = False) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), dtype=np.int32)
        for i, t in enumerate(texts):
            ids = [self.sot_id] + self.encode(t) + [self.eot_id]
            if len(ids) > context_length:
                if not truncate:
                    raise ValueError(
                        f"input {t!r} is {len(ids)} tokens > context "
                        f"{context_length}")
                ids = ids[: context_length - 1] + [self.eot_id]
            out[i, : len(ids)] = ids
        return out

    __call__ = tokenize


class ClipBatchTokenizer:
    """WordPieceTokenizer-compatible facade over ClipTokenizer so the CLIP
    text tower plugs into the standard data plane (Collator calls
    `tokenizer(texts, max_length=...)` → {'input_ids','attention_mask'};
    cli.train persists the vocab next to checkpoints via save_vocab)."""

    def __init__(self, tok: ClipTokenizer, bpe_path: Optional[str] = None):
        self.tok = tok
        self.bpe_path = bpe_path
        self.pad_id = 0
        self.vocab_size = tok.vocab_size

    def __call__(self, texts, max_length: int = CONTEXT_LENGTH):
        ids = self.tok.tokenize(texts, context_length=max_length, truncate=True)
        return {"input_ids": ids,
                "attention_mask": (ids != self.pad_id).astype(np.int32)}

    def encode(self, text: str, add_special_tokens: bool = True,
               max_length: Optional[int] = None):
        ids = self.tok.encode(text)
        if add_special_tokens:
            ids = [self.tok.sot_id] + ids + [self.tok.eot_id]
        return ids[:max_length] if max_length else ids

    def save_vocab(self, path: str) -> str:
        """Persist the EXACT tokenizer next to the checkpoints: copy the BPE
        merges file as <dir>/clip_bpe.txt.gz (resolve_tokenizer finds it on
        resume/eval — mismatched merges would silently garble text)."""
        import shutil

        out = os.path.join(os.path.dirname(path), "clip_bpe.txt.gz")
        if self.bpe_path and os.path.exists(self.bpe_path):
            shutil.copyfile(self.bpe_path, out)
        else:  # synthetic-merges tokenizer: persist the merge table verbatim
            import gzip

            merges = sorted(self.tok.rank.items(), key=lambda kv: kv[1])
            with gzip.open(out, "wt", encoding="utf-8") as f:
                f.write("#version: oatx-synthetic\n")
                for (a, b), _ in merges:
                    f.write(f"{a} {b}\n")
        return out


def load_clip_batch_tokenizer(search_dirs=None, bpe_path: Optional[str] = None,
                              corpus=None) -> ClipBatchTokenizer:
    """Resolution order mirrors cli.common.resolve_tokenizer: checkpoint-dir
    clip_bpe.txt.gz → explicit path/$OATX_CLIP_BPE/assets → hermetic synthetic
    merges built from the corpus."""
    for d in search_dirs or []:
        p = os.path.join(str(d), "clip_bpe.txt.gz")
        if os.path.exists(p):
            return ClipBatchTokenizer(ClipTokenizer(bpe_path=p), bpe_path=p)
    p = bpe_path or default_bpe_path()
    if p:
        return ClipBatchTokenizer(ClipTokenizer(bpe_path=p), bpe_path=p)
    texts = corpus() if callable(corpus) else (corpus or [])
    return ClipBatchTokenizer(ClipTokenizer.for_tests(texts, extra_merges=256))
