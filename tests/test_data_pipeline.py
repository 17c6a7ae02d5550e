import os

import numpy as np
import pytest

from oatx.config.schema import DataLoaderCfg, ExperimentCfg
from oatx.data.factory import build_dataset, build_loaders
from oatx.data.loader import Collator, MultiLoader, ShardedLoader
from oatx.data.tokenizer import WordPieceTokenizer


@pytest.fixture(scope="module")
def synth_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return DataLoaderCfg(
        type="TextVideoDataLoader",
        dataset_name="SyntheticVideoText",
        data_dir=str(root / "videos"),
        object_dir=str(root / "objects"),
        batch_size=4,
        num_workers=4,
        split="train",
        video_params={"input_res": 224, "num_frames": 4, "num_videos": 12, "loading": "lax"},
    )


@pytest.fixture(scope="module")
def tokenizer():
    corpus = [f"a dog runs in scene {i}" for i in range(20)] + [
        "cat jumps", "car moves", "tree stands", "person plays", "bird sits",
        "boat", "horse",
    ]
    return WordPieceTokenizer.build_from_corpus(corpus, vocab_size=512)


def test_synthetic_dataset_sample(synth_cfg):
    ds = build_dataset(synth_cfg, variant="baseline")
    assert len(ds) == 12
    s = ds.get_sample(0, np.random.default_rng(0))
    assert s["video"].shape == (4, 256, 256, 3)
    assert s["video"].dtype == np.uint8
    assert isinstance(s["text"], str)
    assert s["meta"]["dataset"] == "SyntheticVideoText"


def test_sample_determinism(synth_cfg):
    ds = build_dataset(synth_cfg, variant="baseline")
    a = ds.get_sample(3, np.random.default_rng(7))
    b = ds.get_sample(3, np.random.default_rng(7))
    np.testing.assert_array_equal(a["video"], b["video"])


def test_global_local_sample(synth_cfg):
    ds = build_dataset(synth_cfg, variant="global_local")
    s = ds.get_sample(1, np.random.default_rng(0))
    assert "pad_text" in s and len(s["pad_text"]) > len(s["text"])
    assert s["object_frame"].shape == (1, 256, 256, 3)
    assert s["patch_masks"].shape[1] == 196
    assert s["tag_class_ids"].shape == (20,)


def test_region_mem_sample(synth_cfg):
    from oatx.data.objects import RegionMemoryBank

    bank = RegionMemoryBank(np.random.default_rng(0).standard_normal((1600, 512)).astype(np.float32))
    ds = build_dataset(synth_cfg, variant="region_mem", region_bank=bank)
    s = ds.get_sample(2, np.random.default_rng(0))
    assert s["patch_masks"].shape == (5, 196)
    assert s["text_region_embedding"].shape == (5, 512)
    assert s["object_frame"].shape == (1, 256, 256, 3)


def test_sharded_loader_partitions(synth_cfg, tokenizer):
    ds = build_dataset(synth_cfg, variant="baseline")
    col = Collator(tokenizer)
    seen = []
    for shard in range(2):
        loader = ShardedLoader(ds, batch_size=2, collate=col, shuffle=True,
                               shard_id=shard, num_shards=2, num_workers=2, seed=1)
        loader.set_epoch(0)
        for batch in loader:
            assert batch["video"].shape == (2, 4, 256, 256, 3)
            assert batch["input_ids"].shape[0] == 2
            seen.extend(m["index"] for m in batch["meta"])
    assert len(seen) == 12
    assert len(set(seen)) == 12  # shards disjoint, full coverage


def test_loader_epoch_reshuffles(synth_cfg, tokenizer):
    ds = build_dataset(synth_cfg, variant="baseline")
    loader = ShardedLoader(ds, batch_size=4, collate=Collator(tokenizer),
                           shuffle=True, num_workers=2, seed=1)
    loader.set_epoch(0)
    e0 = [m["index"] for b in loader for m in b["meta"]]
    loader.set_epoch(1)
    e1 = [m["index"] for b in loader for m in b["meta"]]
    assert e0 != e1 and sorted(e0) == sorted(e1)


def test_multi_loader_alternates(synth_cfg, tokenizer):
    ds = build_dataset(synth_cfg, variant="baseline")
    col = Collator(tokenizer)
    l1 = ShardedLoader(ds, batch_size=2, collate=col, num_workers=2)
    l2 = ShardedLoader(ds, batch_size=3, collate=col, num_workers=2)
    ml = MultiLoader([l1, l2])
    order = [i for i, _ in ml]
    assert order[:6] == [0, 1, 0, 1, 0, 1]
    assert len(order) == len(ml)


def test_lax_loading_recovers(synth_cfg, tokenizer, tmp_path):
    """A corrupt video must be substituted, not crash (lax mode)."""
    ds = build_dataset(synth_cfg, variant="baseline")
    # corrupt one clip
    victim = os.path.join(synth_cfg.data_dir, "clip0005.avi")
    with open(victim, "wb") as f:
        f.write(b"not a video at all")
    try:
        s = ds.get_sample(5, np.random.default_rng(0))
        assert s["video"].shape == (4, 256, 256, 3)  # substituted sample
    finally:
        os.remove(victim)  # SyntheticVideoText regenerates it on next build


def test_strict_loading_raises(synth_cfg):
    import dataclasses

    strict_cfg = dataclasses.replace(
        synth_cfg,
        video_params={**synth_cfg.video_params, "loading": "strict"})
    ds = build_dataset(strict_cfg, variant="baseline")
    victim = os.path.join(synth_cfg.data_dir, "clip0007.avi")
    data = open(victim, "rb").read()
    with open(victim, "wb") as f:
        f.write(b"garbage")
    try:
        with pytest.raises(ValueError, match="strict"):
            ds.get_sample(7, np.random.default_rng(0))
    finally:
        with open(victim, "wb") as f:
            f.write(data)


def test_build_loaders_from_experiment(synth_cfg, tokenizer):
    exp = ExperimentCfg.from_dict({
        "name": "t", "arch": {"variant": "baseline", "args": {}},
        "data_loader": [
            {"type": "x", "args": {
                "dataset_name": "SyntheticVideoText",
                "data_dir": synth_cfg.data_dir, "object_dir": synth_cfg.object_dir,
                "batch_size": 2, "num_workers": 2, "split": "train",
                "video_params": {"num_frames": 2, "num_videos": 12},
            }},
        ],
    })
    loaders = build_loaders(exp, tokenizer)
    assert len(loaders) == 1
    b = next(iter(loaders[0]))
    assert b["video"].shape == (2, 2, 256, 256, 3)


def test_multi_loader_cycle_shorter(synth_cfg, tokenizer):
    """inf_loop parity: the shorter loader wraps with a fresh shuffle; epoch
    ends with the longest loader."""
    import dataclasses

    from oatx.data.factory import build_dataset
    from oatx.data.loader import Collator, MultiLoader, ShardedLoader

    ds = build_dataset(synth_cfg, variant="baseline")  # 12 items
    col = Collator(tokenizer)
    short = ShardedLoader(ds, batch_size=6, collate=col, shuffle=True,
                          num_workers=2, seed=3)   # 2 batches
    long = ShardedLoader(ds, batch_size=2, collate=col, shuffle=True,
                         num_workers=2, seed=4)    # 6 batches
    ml = MultiLoader([short, long], cycle_shorter=True)
    assert len(ml) == 12  # 6 cycles x 2 loaders
    out = list(ml)
    assert len(out) == 12
    # the short loader wrapped twice (6 cycles / 2 batches per pass = 3 passes)
    short_batches = [b for i, b in out if i == 0]
    assert len(short_batches) == 6
    # wraps reshuffle: first pass order differs from second pass order
    idx = [tuple(m["index"] for m in b["meta"]) for b in short_batches]
    assert idx[0:2] != idx[2:4]
    # default semantics unchanged: stops at shortest
    ml2 = MultiLoader([short, long])
    assert len(list(ml2)) == 4


def test_multi_loader_endless(synth_cfg, tokenizer):
    """Iteration-based mode: every loader rewraps forever; the consumer bounds
    the epoch (reference len_epoch + inf_loop, trainer_dist.py:76-79)."""
    ds = build_dataset(synth_cfg, variant="baseline")  # 12 items
    col = Collator(tokenizer)
    l1 = ShardedLoader(ds, batch_size=6, collate=col, shuffle=True,
                       num_workers=2, seed=3)  # 2 batches/pass
    l2 = ShardedLoader(ds, batch_size=4, collate=col, shuffle=True,
                       num_workers=2, seed=4)  # 3 batches/pass
    ml = MultiLoader([l1, l2], endless=True)
    with pytest.raises(TypeError):
        len(ml)
    out = []
    for item in ml:
        out.append(item)
        if len(out) >= 20:  # 10 cycles — far past both loader lengths
            break
    assert [i for i, _ in out[:4]] == [0, 1, 0, 1]
    # both loaders wrapped several times and reshuffled on each wrap
    idx1 = [tuple(m["index"] for m in b["meta"]) for i, b in out if i == 0]
    assert len(idx1) == 10
    assert idx1[0:2] != idx1[2:4]


def test_cycle_shorter_stream_is_pure_function_of_epoch(synth_cfg, tokenizer):
    """Sample-exact resume: epoch N's wrapped stream must be identical whether
    the process ran epoch N-1 first (accumulating wraps) or started fresh at
    epoch N — set_epoch resets the wrap counter."""
    def make_multi():
        ds = build_dataset(synth_cfg, variant="baseline")
        col = Collator(tokenizer)
        short = ShardedLoader(ds, batch_size=6, collate=col, shuffle=True,
                              num_workers=2, seed=3)
        long = ShardedLoader(ds, batch_size=2, collate=col, shuffle=True,
                             num_workers=2, seed=4)
        return MultiLoader([short, long], cycle_shorter=True)

    def stream(ml, epoch):
        for l in ml.loaders:  # trainer calls set_epoch on loaders directly
            l.set_epoch(epoch)
        return [(i, tuple(m["index"] for m in b["meta"])) for i, b in ml]

    continuing = make_multi()
    stream(continuing, 1)               # epoch 1 accumulates wraps
    e2_after_e1 = stream(continuing, 2)
    fresh = make_multi()                # resumed process: epoch 2 directly
    e2_fresh = stream(fresh, 2)
    assert e2_after_e1 == e2_fresh


def test_loader_echo_factor(synth_cfg, tokenizer):
    """Data echoing: each decoded batch yields E times with identical content,
    len() scales by E, echoes never re-decode, and echoed-stream resume
    arithmetic matches the full stream's suffix."""
    ds = build_dataset(synth_cfg, variant="baseline")

    calls = {"n": 0}
    real_get = ds.get_sample

    def counting_get(i, rng):
        calls["n"] += 1
        return real_get(i, rng)

    ds.get_sample = counting_get
    try:
        col = Collator(tokenizer)
        plain = ShardedLoader(ds, batch_size=4, collate=col, shuffle=True,
                              num_workers=2, seed=1)
        echo = ShardedLoader(ds, batch_size=4, collate=col, shuffle=True,
                             num_workers=2, seed=1, echo_factor=3)
        assert len(echo) == 3 * len(plain)

        plain.set_epoch(0)
        base = [[m["index"] for m in b["meta"]] for b in plain]
        calls["n"] = 0
        echo.set_epoch(0)
        echoed = [[m["index"] for m in b["meta"]] for b in echo]
        # each decoded batch appears 3x consecutively, in the plain order
        assert echoed == [idx for idx in base for _ in range(3)]
        # echoes are free: decode count equals the UN-echoed sample count
        assert calls["n"] == len(base) * 4

        # resume mid-echo: start_batch indexes the echoed stream
        tail = [[m["index"] for m in b["meta"]]
                for b in echo.iter_batches(start_batch=4)]
        assert tail == echoed[4:]
    finally:
        ds.get_sample = real_get


def test_loader_echo_config_passthrough(synth_cfg, tokenizer, tmp_path):
    """echo_factor flows from the JSON config to the train loader, and is
    forced to 1 for non-train splits."""
    import dataclasses as dc

    cfg = dc.replace(synth_cfg, echo_factor=2)
    exp = ExperimentCfg(data_loaders=[cfg])
    loaders = build_loaders(exp, tokenizer, split="train")
    assert loaders[0].echo_factor == 2
    val = build_loaders(exp, tokenizer, split="val")
    assert val[0].echo_factor == 1


def test_synthetic_dataset_inter_codec(tmp_path, tokenizer):
    """fixture_codec writes inter-coded mp4 clips (WebVid-realistic decode);
    the full dataset->loader path must work identically over them."""
    cfg = DataLoaderCfg(
        type="TextVideoDataLoader", dataset_name="SyntheticVideoText",
        data_dir=str(tmp_path / "v264"), object_dir="", batch_size=4,
        num_workers=2, split="train",
        video_params={"input_res": 224, "num_frames": 4, "num_videos": 4,
                      "loading": "lax", "fixture_codec": "mpeg4",
                      "fixture_gop": 8},
    )
    ds = build_dataset(cfg, "baseline", "train")
    assert os.path.exists(os.path.join(cfg.data_dir, "clip0000.mp4"))
    item = ds[0]
    assert item["video"].shape[0] == 4
    loader = ShardedLoader(ds, batch_size=4, collate=Collator(tokenizer),
                           shuffle=True, num_workers=2, seed=0)
    batches = list(loader)
    assert batches and batches[0]["video"].shape[:2] == (4, 4)


def test_reference_full_frame_train_crop(tmp_path):
    """train_crop='reference_full_frame' (the crop-divergence ablation lane):
    samples ship input_res² uint8 frames already RRC'd over the FULL decoded
    frame, deterministically per (seed, index); eval split keeps the
    canonical chain."""
    from oatx.config.schema import DataLoaderCfg
    from oatx.data.factory import build_dataset

    vp = {"num_frames": 4, "num_videos": 4, "loading": "lax",
          "train_crop": "reference_full_frame", "input_res": 224,
          "fixture_width": 320, "fixture_height": 240, "fixture_frames": 32}
    cfg = DataLoaderCfg(dataset_name="SyntheticVideoText",
                        data_dir=str(tmp_path / "v"), object_dir="",
                        batch_size=4, num_workers=0, split="train",
                        video_params=vp)
    ds = build_dataset(cfg, "baseline", "train")
    s1 = ds.get_sample(0, np.random.default_rng((0, 0)))
    s2 = ds.get_sample(0, np.random.default_rng((0, 0)))
    assert s1["video"].shape == (4, 224, 224, 3)
    assert s1["video"].dtype == np.uint8
    np.testing.assert_array_equal(s1["video"], s2["video"])
    # different sample index → different crop box (content differs)
    s3 = ds.get_sample(1, np.random.default_rng((0, 1)))
    assert not np.array_equal(s1["video"], s3["video"])

    # eval split is untouched by the option (canonical 256² chain)
    cfg_t = DataLoaderCfg(dataset_name="SyntheticVideoText",
                          data_dir=str(tmp_path / "v"), object_dir="",
                          batch_size=4, num_workers=0, split="test",
                          video_params=vp)
    dt = build_dataset(cfg_t, "baseline", "test")
    st = dt.get_sample(0, np.random.default_rng((0, 0)))
    assert st["video"].shape == (4, 256, 256, 3)


def test_reference_full_frame_image_datasets(tmp_path):
    """The host-faithful crop lane must cover the IMAGE loaders too (CC3M is
    half of every pod recipe pairing): still images and tar members ship
    input_res² RRC'd frames, deterministic per (seed, index)."""
    import io
    import tarfile

    from PIL import Image

    from oatx.config.schema import DataLoaderCfg
    from oatx.data.factory import build_dataset

    meta = tmp_path / "meta_data"
    meta.mkdir()
    rows = ["caption\tfile"]
    for i in range(2):
        p = tmp_path / "training" / f"img{i}.jpg"
        p.parent.mkdir(exist_ok=True)
        Image.fromarray(np.random.default_rng(i).integers(
            0, 255, (300, 400, 3)).astype(np.uint8)).save(p)
        rows.append(f"an image {i}\timg{i}.jpg")
    (meta / "cc3m_training_success_full.tsv").write_text("\n".join(rows))
    vp = {"num_frames": 1, "loading": "lax",
          "train_crop": "reference_full_frame", "input_res": 224}
    cfg = DataLoaderCfg(dataset_name="ConceptualCaptions3M",
                        data_dir=str(tmp_path), metadata_dir=str(tmp_path),
                        split="train", video_params=vp)
    ds = build_dataset(cfg, "baseline", "train")
    s1 = ds.get_sample(0, np.random.default_rng((7, 0)))
    s2 = ds.get_sample(0, np.random.default_rng((7, 0)))
    assert s1["video"].shape == (1, 224, 224, 3)
    assert s1["video"].dtype == np.uint8
    np.testing.assert_array_equal(s1["video"], s2["video"])

    # tar shards take the same lane (native-size decode inside the tar reader)
    rows = ["caption\tmember"]
    with tarfile.open(tmp_path / "shard0.tar", "w") as tf:
        for i in range(2):
            img = Image.fromarray(np.random.default_rng(10 + i).integers(
                0, 255, (300, 400, 3)).astype(np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            buf.seek(0)
            info = tarfile.TarInfo(f"images/{i}.jpg")
            info.size = len(buf.getvalue())
            tf.addfile(info, buf)
            rows.append(f"tar image {i}\tshard0.tar/images/{i}.jpg")
    (meta / "cc3m_tar_train.tsv").write_text("\n".join(rows))
    cfg_t = DataLoaderCfg(dataset_name="ConceptualCaptions3MTar",
                          data_dir=str(tmp_path), metadata_dir=str(tmp_path),
                          split="train", video_params=vp)
    dt = build_dataset(cfg_t, "baseline", "train")
    st = dt.get_sample(0, np.random.default_rng((7, 0)))
    assert st["video"].shape == (1, 224, 224, 3)
    # the RRC saw the native 300x400 frame, not a canonical square: crops are
    # reproducible but differ across indices
    st2 = dt.get_sample(1, np.random.default_rng((7, 1)))
    assert not np.array_equal(st["video"], st2["video"])
