"""Mid-epoch preemption resume: a run interrupted at cycle K and resumed must
process exactly the remaining cycles of that epoch and match the uninterrupted
run's trajectory (sample rngs are (seed, epoch, index)-keyed)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oatx.config.schema import ExperimentCfg
from oatx.data.factory import build_loaders
from oatx.data.tokenizer import WordPieceTokenizer
from oatx.train import checkpoint as ckptlib
from oatx.train.trainer import Trainer


def _exp(tmp_path, epochs=2):
    return ExperimentCfg.from_dict({
        "name": "mid",
        "arch": {"variant": "baseline", "args": {
            "video_params": {"model": "SpaceTimeTransformer", "num_frames": 2,
                             "input_res": 32, "embed_dim": 32, "depth": 1,
                             "num_heads": 2, "pretrained": False},
            "text_params": {"model": "distilbert-base-uncased", "pretrained": False,
                            "vocab_size": 256, "dim": 32, "hidden_dim": 64,
                            "n_layers": 1, "n_heads": 2},
            "projection_dim": 8}},
        "data_loader": [{"type": "x", "args": {
            "dataset_name": "SyntheticVideoText",
            "data_dir": str(tmp_path / "v"), "object_dir": "",
            "batch_size": 8, "num_workers": 2, "split": "train",
            "video_params": {"input_res": 32, "num_frames": 2,
                             "num_videos": 32, "loading": "lax"}}}],
        "optimizer": {"type": "AdamW", "args": {"lr": 1e-3}},
        "loss": {"type": "NormSoftmaxLoss"},
        "metrics": ["t2v_metrics"],
        "trainer": {"epochs": epochs, "save_dir": str(tmp_path / "e"),
                    "monitor": "off", "init_val": False, "precision": "f32",
                    "verbosity": 0, "seed": 0},
    })


def test_midepoch_resume_matches_uninterrupted(tmp_path):
    tok = WordPieceTokenizer.build_from_corpus(
        [f"scene {i} dog" for i in range(40)], vocab_size=256)

    # uninterrupted single epoch (4 cycles of batch 8 over 32 clips)
    exp = _exp(tmp_path, epochs=1)
    trA = Trainer(exp, build_loaders(exp, tok), [], save_dir=None, log_dir=None)
    trA.train()
    ref_params = jax.tree_util.tree_map(np.asarray, trA.state.params)

    # interrupted: same init, preempt after cycle 2, snapshot, then resume
    trB = Trainer(exp, build_loaders(exp, tok),
                  [], save_dir=str(tmp_path / "ck"), log_dir=None)
    # simulate the preemption path deterministically: run 2 cycles manually
    from oatx.data.loader import MultiLoader, device_prefetch

    loader = trB.train_loaders[0]
    loader.set_epoch(1)
    it = device_prefetch(iter(MultiLoader(trB.train_loaders)), trB.mesh)
    for cyc in range(2):
        _, batch = next(it)
        batch.pop("meta", None)
        trB.state, m = trB.train_step(trB.state, batch)
    _ = float(m["loss"])
    it.close()
    ckptlib.save_checkpoint(str(tmp_path / "ck"), "preempt-epoch1", trB.state,
                            1, np.inf, extra_meta={"cycles_done": 2})

    # resume continues at epoch 1 cycle 2 and finishes identically
    trC = Trainer(exp, build_loaders(exp, tok), [], save_dir=None, log_dir=None,
                  resume=str(tmp_path / "ck" / "preempt-epoch1"))
    assert trC.start_epoch == 1 and trC._resume_cycle == 2
    trC.train()
    out_params = jax.tree_util.tree_map(np.asarray, trC.state.params)
    np.testing.assert_allclose(out_params["vid_proj"]["kernel"],
                               ref_params["vid_proj"]["kernel"], atol=1e-5)
    np.testing.assert_allclose(out_params["video"]["cls_token"],
                               ref_params["video"]["cls_token"], atol=1e-5)


def test_end_of_epoch_preempt_meta_starts_next_epoch(tmp_path):
    tok = WordPieceTokenizer.build_from_corpus(["a dog"], vocab_size=256)
    exp = _exp(tmp_path, epochs=2)
    tr = Trainer(exp, build_loaders(exp, tok), [],
                 save_dir=str(tmp_path / "ck2"), log_dir=None)
    ckptlib.save_checkpoint(str(tmp_path / "ck2"), "preempt-epoch1", tr.state, 1,
                            np.inf, extra_meta={"cycles_done": tr.cycles_per_epoch})
    tr2 = Trainer(exp, build_loaders(exp, tok), [], save_dir=None, log_dir=None,
                  resume=str(tmp_path / "ck2" / "preempt-epoch1"))
    assert tr2.start_epoch == 2 and tr2._resume_cycle == 0


def test_preempt_outside_step_loop_still_snapshots(tmp_path):
    """Round-5 soak-drill regression: a SIGTERM that lands OUTSIDE the step
    loop (during validation / the epoch summary) must still produce a
    preemption snapshot — previously the epoch loop only warned and exited,
    and the process could die snapshot-less while waiting for the next
    epoch's first batch."""
    import os

    tok = WordPieceTokenizer.build_from_corpus(
        [f"scene {i} dog" for i in range(40)], vocab_size=256)
    exp = _exp(tmp_path, epochs=3)
    tr = Trainer(exp, build_loaders(exp, tok), [],
                 save_dir=str(tmp_path / "ck_sig"), log_dir=None)

    # simulate the signal landing between _train_epoch and the next epoch:
    # flag raised from the epoch-summary path (after epoch 1 completes)
    real_epoch = tr._train_epoch

    def epoch_then_signal(epoch, start_cycle=0):
        out = real_epoch(epoch, start_cycle=start_cycle)
        tr._preempted = True  # as the SIGTERM handler would
        return out

    tr._train_epoch = epoch_then_signal
    tr.train()
    snaps = [d for d in os.listdir(tmp_path / "ck_sig")
             if d.startswith("preempt-epoch")
             and os.path.isdir(tmp_path / "ck_sig" / d)]  # not the .meta.json
    assert snaps, "no preemption snapshot written for an out-of-loop signal"
    # the snapshot marks epoch 1 complete → resume starts at epoch 2, cycle 0
    tr2 = Trainer(exp, build_loaders(exp, tok), [], save_dir=None,
                  log_dir=None,
                  resume=str(tmp_path / "ck_sig" / sorted(snaps)[-1]))
    assert tr2.start_epoch == 2 and tr2._resume_cycle == 0


def test_resume_fastforward_does_no_decode_work(tmp_path):
    """MultiLoader.iter_from(k) must never fetch a skipped sample — resume of
    cycle K does zero decode work for cycles < K (index arithmetic only)."""
    from oatx.data.factory import build_dataset
    from oatx.data.loader import Collator, MultiLoader, ShardedLoader

    tok = WordPieceTokenizer.build_from_corpus(
        [f"scene {i} dog" for i in range(40)], vocab_size=256)
    cfg = _exp(tmp_path).data_loaders[0]
    ds = build_dataset(cfg, variant="baseline")

    fetched = []
    real = ds.get_sample

    class Spy:
        def __getattr__(self, a):
            return getattr(ds, a)

        def __len__(self):
            return len(ds)

        def get_sample(self, i, rng):
            fetched.append(i)
            return real(i, rng)

    def mk():
        return ShardedLoader(Spy(), batch_size=8, collate=Collator(tok),
                             shuffle=True, num_workers=1, seed=3)

    # reference: full epoch stream (4 cycles), record which batch each sample
    # belongs to
    full = mk()
    full.set_epoch(1)
    stream = [b["meta"] for _, b in MultiLoader([full]).iter_from(0)]
    assert len(stream) == 4
    full_fetches = list(fetched)

    # resumed: skip 2 cycles — only the last 2 batches' samples may be fetched
    fetched.clear()
    res = mk()
    res.set_epoch(1)
    tail = [b["meta"] for _, b in MultiLoader([res]).iter_from(2)]
    assert len(tail) == 2
    assert tail == stream[2:]
    assert sorted(fetched) == sorted(full_fetches[2 * 8:])
    assert len(fetched) == 16  # exactly the remaining samples, nothing more


def test_epoch_loss_is_exact_all_batch_mean(tmp_path):
    """The reported loss_i equals the mean over EVERY batch's loss (on-device
    accumulation), not a log_step subsample."""
    tok = WordPieceTokenizer.build_from_corpus(
        [f"scene {i} dog" for i in range(40)], vocab_size=256)
    exp = _exp(tmp_path, epochs=1)
    tr = Trainer(exp, build_loaders(exp, tok), [], save_dir=None, log_dir=None)

    # wrap the train step to record every batch's loss
    seen = []
    inner = tr.train_step

    def spy_step(state, batch):
        state, m = inner(state, batch)
        seen.append(m["loss"])
        return state, m

    tr.train_step = spy_step
    hist = tr.train()
    assert len(seen) == tr.cycles_per_epoch
    expect = float(np.mean([float(l) for l in seen]))
    np.testing.assert_allclose(hist[1]["loss_0"], expect, rtol=1e-6)


def test_fsdp_resume_preserves_sharded_layout(tmp_path):
    """A resumed trainer.fsdp run must re-place params AND optimizer moments
    with the FSDP specs — a base-spec re-place would silently de-shard the
    pod run (params+moments replicated → data_size× HBM)."""
    tok = WordPieceTokenizer.build_from_corpus(
        [f"scene {i} dog" for i in range(40)], vocab_size=256)
    exp = _exp(tmp_path, epochs=1)
    exp.trainer.fsdp = True
    # big enough kernels that fsdp's min_size threshold actually shards some
    # leaves on the 8-way data axis (fc1: 128x512 = 65536 elements)
    exp.arch.video_params.embed_dim = 128
    exp.arch.video_params.num_heads = 4
    tr = Trainer(exp, build_loaders(exp, tok), [],
                 save_dir=str(tmp_path / "ck"), log_dir=None)
    tr.train()
    ckptlib.save_checkpoint(tmp_path / "ck", "final", tr.state, 1, 0.0)

    tr2 = Trainer(exp, build_loaders(exp, tok), [], save_dir=None, log_dir=None,
                  resume=str(tmp_path / "ck" / "final"))
    # values round-trip
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.params),
                    jax.tree_util.tree_leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # layout round-trips: the resumed INITIAL placement must match what a
    # fresh fsdp trainer's initial placement looks like (post-training state
    # shardings are XLA's choice and not the comparison point)
    tr3 = Trainer(exp, build_loaders(exp, tok), [], save_dir=None, log_dir=None)
    fresh = jax.tree_util.tree_leaves(tr3.state.params) + \
        jax.tree_util.tree_leaves(tr3.state.opt_state)
    resumed = jax.tree_util.tree_leaves(tr2.state.params) + \
        jax.tree_util.tree_leaves(tr2.state.opt_state)
    n_sharded = 0
    for a, b in zip(fresh, resumed):
        sa = getattr(a, "sharding", None)
        sb = getattr(b, "sharding", None)
        if sa is not None and getattr(sa, "spec", None) and "data" in tuple(
                x for x in sa.spec if x is not None):
            n_sharded += 1
            # specs may differ in trailing size-1 axes; compare placements
            assert sb is not None and sa.is_equivalent_to(sb, a.ndim), (
                sa.spec, sb.spec)
    assert n_sharded > 0, "no leaf was fsdp-sharded — the check proved nothing"


def test_resume_across_topology_change(tmp_path):
    """Elastic recovery: a checkpoint saved on an 8-device mesh must resume
    on a 4-device mesh (pod shrink after preemption) and vice versa — values
    identical, state placed on the NEW mesh. The reference has no elastic
    story at all (NCCL world size is fixed at launch); oatx checkpoints are
    placement-free by design (Orbax restore into the new mesh's template
    shardings)."""
    from oatx.parallel import mesh as meshlib

    tok = WordPieceTokenizer.build_from_corpus(
        [f"scene {i} dog" for i in range(40)], vocab_size=256)
    exp = _exp(tmp_path, epochs=1)
    tr8 = Trainer(exp, build_loaders(exp, tok), [], save_dir=None, log_dir=None)
    assert tr8.mesh.shape["data"] == 8
    tr8.train()
    ckptlib.save_checkpoint(str(tmp_path / "ck"), "final", tr8.state, 1, 0.0)
    ref = jax.tree_util.tree_map(np.asarray, tr8.state.params)

    # shrink: 8 → 4 devices (batch 8 still divides 4)
    mesh4 = meshlib.make_mesh(4)
    tr4 = Trainer(exp, build_loaders(exp, tok), [], save_dir=None,
                  log_dir=None, mesh=mesh4,
                  resume=str(tmp_path / "ck" / "final"))
    got = jax.tree_util.tree_map(np.asarray, tr4.state.params)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(a, b)
    for leaf in jax.tree_util.tree_leaves(tr4.state.params):
        assert set(leaf.sharding.mesh.devices.flat) == set(
            mesh4.devices.flat), "leaf not placed on the shrunk mesh"
    # the shrunk trainer actually steps
    from oatx.data.loader import MultiLoader, device_prefetch

    tr4.train_loaders[0].set_epoch(2)
    it = device_prefetch(iter(MultiLoader(tr4.train_loaders)), tr4.mesh)
    _, batch = next(it)
    batch.pop("meta", None)
    state, m = tr4.train_step(tr4.state, batch)
    assert np.isfinite(float(m["loss"]))
    it.close()

    # grow back: 4 → 8, with fsdp ON in the resumed run (re-shard over the
    # larger data axis from a checkpoint that never saw fsdp)
    ckptlib.save_checkpoint(str(tmp_path / "ck4"), "final", state, 1, 0.0)
    exp.trainer.fsdp = True
    exp.arch.video_params.embed_dim = 32  # unchanged; threshold keeps small leaves whole
    mesh8 = meshlib.make_mesh(8)
    tr8b = Trainer(exp, build_loaders(exp, tok), [], save_dir=None,
                   log_dir=None, mesh=mesh8,
                   resume=str(tmp_path / "ck4" / "final"))
    got2 = jax.tree_util.tree_map(np.asarray, tr8b.state.params)
    ref2 = jax.tree_util.tree_map(np.asarray, state.params)
    for a, b in zip(jax.tree_util.tree_leaves(ref2),
                    jax.tree_util.tree_leaves(got2)):
        np.testing.assert_array_equal(a, b)
