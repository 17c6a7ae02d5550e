import io
import os
import tarfile

import numpy as np
import pytest

from oatx.config.schema import DataLoaderCfg
from oatx.data.factory import build_dataset


@pytest.fixture
def tar_root(tmp_path):
    from PIL import Image

    meta = tmp_path / "meta_data"
    meta.mkdir()
    rows = ["caption\tmember"]
    with tarfile.open(tmp_path / "shard0.tar", "w") as tf:
        for i in range(3):
            img = Image.fromarray(
                np.random.default_rng(i).integers(0, 255, (300, 400, 3)).astype(np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            buf.seek(0)
            info = tarfile.TarInfo(f"images/{i}.jpg")
            info.size = len(buf.getvalue())
            tf.addfile(info, buf)
            rows.append(f"tar image {i}\tshard0.tar/images/{i}.jpg")
    (meta / "cc3m_tar_train.tsv").write_text("\n".join(rows))
    return tmp_path


def test_tar_dataset_reads_members(tar_root):
    cfg = DataLoaderCfg(dataset_name="ConceptualCaptions3MTar",
                        data_dir=str(tar_root), metadata_dir=str(tar_root),
                        split="train",
                        video_params={"num_frames": 1, "loading": "lax"})
    ds = build_dataset(cfg, "baseline", "train")
    assert len(ds) == 3
    s = ds.get_sample(1, np.random.default_rng(0))
    assert s["video"].shape == (1, 256, 256, 3)
    assert s["text"] == "tar image 1"
    # handle reuse across samples in one thread
    s2 = ds.get_sample(2, np.random.default_rng(0))
    assert not np.array_equal(s["video"], s2["video"])


def test_tar_dataset_missing_member_lax(tar_root):
    cfg = DataLoaderCfg(dataset_name="ConceptualCaptions3MTar",
                        data_dir=str(tar_root), metadata_dir=str(tar_root),
                        split="train",
                        video_params={"num_frames": 1, "loading": "lax"})
    ds = build_dataset(cfg, "baseline", "train")
    ds.metadata[0]["member"] = "shard0.tar/images/nope.jpg"
    s = ds.get_sample(0, np.random.default_rng(0))  # substituted, not crashed
    assert s["video"].shape == (1, 256, 256, 3)


def test_tar_dataset_threaded_loader(tar_root):
    from oatx.data.loader import Collator, ShardedLoader
    from oatx.data.tokenizer import WordPieceTokenizer

    cfg = DataLoaderCfg(dataset_name="ConceptualCaptions3MTar",
                        data_dir=str(tar_root), metadata_dir=str(tar_root),
                        split="train",
                        video_params={"num_frames": 1, "loading": "lax"})
    ds = build_dataset(cfg, "baseline", "train")
    tok = WordPieceTokenizer.build_from_corpus(["tar image 0 1 2"], vocab_size=64)
    loader = ShardedLoader(ds, batch_size=3, collate=Collator(tok),
                           shuffle=False, drop_last=False, num_workers=3)
    batches = list(loader)
    assert batches[0]["video"].shape == (3, 1, 256, 256, 3)
