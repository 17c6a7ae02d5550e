"""Early-exit hygiene: abandoning a prefetched epoch must not leak threads."""

import threading
import time

import numpy as np

from oatx.config.schema import DataLoaderCfg
from oatx.data.factory import build_dataset
from oatx.data.loader import Collator, MultiLoader, ShardedLoader, device_prefetch
from oatx.data.tokenizer import WordPieceTokenizer


def _loader(tmp_path, n=24, workers=4):
    cfg = DataLoaderCfg(
        dataset_name="SyntheticVideoText", data_dir=str(tmp_path / "v"),
        object_dir="", batch_size=2, num_workers=workers, split="train",
        video_params={"input_res": 32, "num_frames": 2, "num_videos": n,
                      "loading": "lax"})
    ds = build_dataset(cfg, "baseline", "train")
    tok = WordPieceTokenizer.build_from_corpus(["a dog"], vocab_size=64)
    return ShardedLoader(ds, batch_size=2, collate=Collator(tok),
                         shuffle=False, num_workers=workers)


def _settle_threads(baseline, timeout=10.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if threading.active_count() <= baseline:
            return True
        time.sleep(0.2)
    return False


def test_early_break_releases_threads(tmp_path):
    baseline = threading.active_count()
    loader = _loader(tmp_path)
    it = device_prefetch(iter(loader))
    next(it)  # consume one batch, abandon the rest
    it.close()
    assert _settle_threads(baseline), (
        f"leaked threads: {threading.active_count()} > baseline {baseline}: "
        f"{[t.name for t in threading.enumerate()]}")


def test_early_break_multi_loader(tmp_path):
    baseline = threading.active_count()
    l1, l2 = _loader(tmp_path, workers=3), _loader(tmp_path, workers=3)
    it = device_prefetch(iter(MultiLoader([l1, l2])))
    next(it)
    next(it)
    it.close()
    assert _settle_threads(baseline)


def test_repeated_epochs_no_accumulation(tmp_path):
    """The trainer pattern: break out of every epoch early, many epochs."""
    loader = _loader(tmp_path)
    baseline = threading.active_count()
    for epoch in range(6):
        loader.set_epoch(epoch)
        it = device_prefetch(iter(loader))
        next(it)
        it.close()
    assert _settle_threads(baseline + 1)  # allow scheduler jitter of one


def test_full_consumption_still_works(tmp_path):
    loader = _loader(tmp_path, n=8, workers=2)
    count = sum(1 for _ in device_prefetch(iter(loader)))
    assert count == 4
