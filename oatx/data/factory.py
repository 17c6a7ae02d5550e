"""Config → datasets/loaders wiring (the reference's dataset_loader/
dataset_object_loader + *DataLoader facades, data_loader/data_loader.py:11-240)."""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from oatx.config.registry import DATASETS
from oatx.config.schema import DataLoaderCfg, ExperimentCfg
from oatx.data import objects as obj
from oatx.data.datasets.base import ObjectOptions
from oatx.data.loader import Collator, MultiLoader, ShardedLoader, build_tag_token_lens
from oatx.data.tokenizer import WordPieceTokenizer

# make adapters register themselves
from oatx.data.datasets import adapters as _adapters  # noqa: F401


def object_options_for_variant(
    variant: str, dl: DataLoaderCfg, region_bank: Optional[obj.RegionMemoryBank] = None
) -> ObjectOptions:
    op = dl.object_params
    tp = dl.text_params
    patch_rows = dl.input_res // 16  # model patch grid (ViT-B/16)
    if variant == "global_local":
        return ObjectOptions(
            tags=True, tags_top_k=int(op.get("top_k", 20)),
            patch_masks=True, num_mask_objects=int(op.get("num_mask_objects", 20)),
            patch_rows=patch_rows,
            object_frame=True,
            features=bool(op.get("input_objects", False)),
        )
    if variant == "region_mem":
        return ObjectOptions(
            patch_masks=True, num_mask_objects=int(op.get("num_mask_objects", 5)),
            patch_rows=patch_rows,
            tags_top_k=int(op.get("top_k", 15)),
            object_frame=True,
            region_memory=region_bank,
        )
    # baseline: object extras only if explicitly requested
    return ObjectOptions(
        tags=bool(tp.get("object_tags", False)),
        features=bool(op.get("input_objects", False)),
        features_top_k=int(op.get("top_k", 10)),
        pseudo_labels=bool(op.get("pseudo_labels", False)),
    )


def load_object_vocab(dl: DataLoaderCfg) -> Optional[List[str]]:
    path = dl.object_params.get("vocab_path")
    if path and os.path.exists(path):
        return obj.load_object_vocab(path)
    return None


def load_region_bank(exp: ExperimentCfg, dim: int = 512) -> Optional[obj.RegionMemoryBank]:
    """CLIP-text memory bank for region_mem. The reference's
    clip_objects_tensor.pt is absent from its repo (SURVEY.md §2 'Region memory
    bank'); oatx loads a .npy if configured, else a seeded random bank so the
    pipeline stays runnable (regenerate offline with tools/build_region_memory.py)."""
    if exp.arch.variant != "region_mem":
        return None
    for dl in exp.data_loaders:
        path = dl.object_params.get("region_memory_path")
        if path and os.path.exists(path):
            return obj.RegionMemoryBank.load(path)
    rng = np.random.default_rng(0)
    return obj.RegionMemoryBank(rng.standard_normal((1600, dim)).astype(np.float32) * 0.02)


def build_dataset(
    dl: DataLoaderCfg,
    variant: str = "baseline",
    split: Optional[str] = None,
    region_bank: Optional[obj.RegionMemoryBank] = None,
    sliding_window_stride: int = -1,
    seed: int = 0,
):
    cls = DATASETS.get(dl.dataset_name)
    opts = object_options_for_variant(variant, dl, region_bank)
    return cls(
        dl, split=split, object_options=opts, object_vocab=load_object_vocab(dl),
        sliding_window_stride=sliding_window_stride, seed=seed,
    )


def tag_token_lens_for(ds, tokenizer):
    """Per-class tag token lengths for the global_local collator (the jitted
    forward needs object_token_masks; this is the single source of the
    vocab-fallback convention shared by training and the eval CLI)."""
    names = ds.object_vocab[1:] if ds.object_vocab else [
        f"obj{i}" for i in range(1600)]
    return build_tag_token_lens(tokenizer, names)


def build_loaders(
    exp: ExperimentCfg,
    tokenizer: WordPieceTokenizer,
    split: Optional[str] = None,
    shard_id: int = 0,
    num_shards: int = 1,
    max_text_len: int = 30,
    seed: int = 0,
) -> List[ShardedLoader]:
    region_bank = load_region_bank(exp)
    loaders = []
    tag_lens = None
    for dl in exp.data_loaders:
        ds = build_dataset(dl, exp.arch.variant, split, region_bank, seed=seed)
        if exp.arch.variant == "global_local" and tag_lens is None:
            tag_lens = tag_token_lens_for(ds, tokenizer)
        collate = Collator(tokenizer, max_text_len=max_text_len,
                           tag_token_lens=tag_lens)
        loaders.append(ShardedLoader(
            ds, batch_size=dl.batch_size, collate=collate,
            shuffle=dl.shuffle if (split or dl.split) == "train" else False,
            shard_id=shard_id, num_shards=num_shards,
            drop_last=(split or dl.split) == "train",
            num_workers=dl.num_workers, seed=seed,
            echo_factor=dl.echo_factor if (split or dl.split) == "train" else 1,
        ))
    return loaders
