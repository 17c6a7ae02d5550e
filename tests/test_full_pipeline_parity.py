"""Full-pipeline rank parity: fixture videos through the REFERENCE's own eval
pipeline (torch float transforms per data_loader/transforms.py:18-29, the
reference SpaceTimeTransformer + HF DistilBERT + model.py:58-72 projections,
reference metric.py) versus the oatx test CLI in a fresh process (native
decode → host canonicalize → device eval transform → towers → metrics), over
the same MSRVTT-format fixture (test.py:122-310 protocol).

The two pipelines intentionally share only the on-disk fixture, the tokenizer
vocab, the frame-sampling indices (sampling.py is separately golden-tested)
and the weights (imported via convert.py, separately golden-tested); the
decode/resize/normalize/model/metric stages are independent implementations
(swscale vs torch bilinear, XLA vs torch). Assertion: identical retrieval
rank ordering both directions — not metric values, which would be trivially
implied — across genuinely different numerics.
"""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

VOCAB_WORDS = [
    "a", "an", "the", "in", "of", "and", "red", "blue", "green", "yellow",
    "purple", "orange", "dark", "bright", "square", "stripes", "dots", "band",
    "waves", "grid", "blobs", "spiral", "drift", "pulse", "spin", "wanders",
    "flow", "flickers", "bounce", "rotates", "slowly", "quickly", "left",
    "right", "down", "top", "middle", "frame", "diagonally", "across",
    "place", "between", "corners", "backwards", "near", "around", "then",
    "again", "until", "clip", "stops", "while",
]
# lexically near-disjoint captions with strongly varied token counts: a tiny
# random text tower's CLS embeddings cluster for same-length short strings, so
# rank separation comes from both content and length
CAPTIONS = [
    "a red square",
    "blue stripes pulse quickly near the top",
    "green dots spin right around the middle of the frame",
    "a dark band wanders down the frame and bounce between corners",
    "bright waves flow diagonally across the middle and the top and the corners",
    "the yellow grid flickers in place slowly then quickly then slowly again until the clip stops",
    "purple blobs bounce between corners",
    "an orange spiral rotates backwards around the frame while bright dots drift near the middle and the top",
]
N_VIDS = len(CAPTIONS)
FRAMES = 2
INPUT_RES = 112
EMBED = 64


@pytest.fixture(scope="module")
def pipeline_root(tmp_path_factory):
    """MSRVTT-format tree (jsfusion cut) with visually DISTINCT videos."""
    from oatx.data import video_reader as vr

    root = tmp_path_factory.mktemp("pipeline_msrvtt")
    vids = [f"video{i}" for i in range(N_VIDS)]
    anns = [{"image_id": v, "caption": CAPTIONS[i]} for i, v in enumerate(vids)]
    os.makedirs(root / "annotation")
    (root / "annotation" / "MSR_VTT.json").write_text(json.dumps({"annotations": anns}))
    sdir = root / "high-quality" / "structured-symlinks"
    os.makedirs(sdir)
    (sdir / "train_list_jsfusion.txt").write_text("")
    (sdir / "val_list_jsfusion.txt").write_text("\n".join(vids) + "\n")
    with open(sdir / "jsfusion_val_caption_idx.pkl", "wb") as f:
        pickle.dump({v: 0 for v in vids}, f)
    for i, v in enumerate(vids):
        p = root / "videos" / "all" / f"{v}.mp4"
        os.makedirs(p.parent, exist_ok=True)
        vr.write_test_video(str(p), 160, 128, 16, 8, seed=i + 1)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + VOCAB_WORDS
    (root / "vocab.txt").write_text("\n".join(vocab) + "\n")
    return root


@pytest.fixture(scope="module")
def torch_models():
    """Small reference-pipeline torch models (random weights, eval mode)."""
    from torch_oracles import load_reference_video_transformer

    mod = load_reference_video_transformer()
    if mod is None:
        pytest.skip("reference repo not available as oracle")
    from transformers import DistilBertConfig, DistilBertModel

    torch.manual_seed(42)
    video_model = mod.SpaceTimeTransformer(
        img_size=INPUT_RES, embed_dim=EMBED, depth=2, num_heads=4,
        num_frames=FRAMES, time_init="random", attention_style="frozen-in-time")
    video_model.head = torch.nn.Identity()
    video_model.pre_logits = torch.nn.Identity()
    with torch.no_grad():
        video_model.temporal_embed.normal_(0, 0.02)
    # initializer_range=0.3: at the HF default 0.02 a random 2-layer tower's
    # CLS output is ~caption-independent (pairwise cosine 0.9999 measured) and
    # every v2t pair is an undecidable tie; the larger init makes content
    # dominate (cosine 0.4-0.85) so rank order is a real signal
    text_model = DistilBertModel(DistilBertConfig(
        dim=EMBED, hidden_dim=2 * EMBED, n_layers=2, n_heads=4,
        initializer_range=0.3))
    # reference model.py:58-66 'minimal' projections
    txt_proj = torch.nn.Sequential(torch.nn.ReLU(), torch.nn.Linear(EMBED, 32))
    vid_proj = torch.nn.Sequential(torch.nn.Linear(EMBED, 32))
    for m in (video_model, text_model, txt_proj, vid_proj):
        m.eval()
    return video_model, text_model, txt_proj, vid_proj


def _reference_eval_frames(path, canon=256):
    """The reference test-split transform chain on natively-decoded frames:
    Resize(256) → CenterCrop(256) → Resize(input_res) → ImageNet normalize
    (data_loader/transforms.py:18-29), torch bilinear, float32."""
    import torch.nn.functional as F

    from oatx.data import video_reader as vr
    from oatx.data.sampling import sample_frames

    vlen, _, _, _ = vr.probe(path)
    idxs = sample_frames(FRAMES, vlen, sample="uniform")
    frames = vr.decode_indices(path, idxs, short_side=128)  # native size
    x = torch.from_numpy(frames.astype(np.float32) / 255.0).permute(0, 3, 1, 2)
    f, c, h, w = x.shape
    scale = canon / min(h, w)
    x = F.interpolate(x, size=(round(h * scale), round(w * scale)),
                      mode="bilinear", align_corners=False)
    top = (x.shape[2] - canon) // 2
    left = (x.shape[3] - canon) // 2
    x = x[:, :, top: top + canon, left: left + canon]
    x = F.interpolate(x, size=(INPUT_RES, INPUT_RES), mode="bilinear",
                      align_corners=False)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    return (x - mean) / std  # (F, C, H, W)


def test_full_pipeline_rank_parity(pipeline_root, torch_models, tmp_path):
    video_model, text_model, txt_proj, vid_proj = torch_models

    # ---------------- reference pipeline (in-process torch)
    from oatx.data.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer.from_vocab_file(str(pipeline_root / "vocab.txt"))
    enc = tok(CAPTIONS, max_length=30)
    with torch.no_grad():
        h = text_model(torch.from_numpy(np.asarray(enc["input_ids"])),
                       attention_mask=torch.from_numpy(np.asarray(enc["attention_mask"]))
                       ).last_hidden_state
        t_emb = txt_proj(h[:, 0, :])  # model.py:108 CLS pooling
        clips = torch.stack([
            _reference_eval_frames(str(pipeline_root / "videos" / "all" / f"video{i}.mp4"))
            for i in range(N_VIDS)])  # (B, F, C, H, W)
        cls, _ = video_model.forward_features(clips)
        v_emb = vid_proj(cls)
    tn = torch.nn.functional.normalize(t_emb, dim=1)
    vn = torch.nn.functional.normalize(v_emb, dim=1)
    sims_ref = (tn @ vn.T).numpy()

    # ---------------- oatx pipeline (fresh-process test CLI)
    sd = {}
    for prefix, m in (("video_model.", video_model), ("text_model.", text_model),
                      ("txt_proj.", txt_proj), ("vid_proj.", vid_proj)):
        for k, v in m.state_dict().items():
            sd[prefix + k] = v
    pth = tmp_path / "weights.pth"
    torch.save({"state_dict": sd}, str(pth))

    cfg = {
        "name": "pipeline-parity",
        "tokenizer": {"vocab": str(pipeline_root / "vocab.txt")},
        "arch": {"variant": "baseline", "args": {
            "video_params": {"model": "SpaceTimeTransformer",
                             "num_frames": FRAMES, "input_res": INPUT_RES,
                             "embed_dim": EMBED, "depth": 2, "num_heads": 4,
                             "time_init": "random", "pretrained": False},
            "text_params": {"model": "distilbert-base-uncased", "pretrained": False,
                            "vocab_size": 30522, "dim": EMBED,
                            "hidden_dim": 2 * EMBED, "n_layers": 2, "n_heads": 4},
            "projection_dim": 32,
            "load_checkpoint": str(pth)}},
        "data_loader": [{"type": "TextVideoDataLoader", "args": {
            "dataset_name": "MSRVTT", "data_dir": str(pipeline_root),
            "cut": "jsfusion", "split": "test", "batch_size": 8, "num_workers": 1,
            "video_params": {"input_res": INPUT_RES, "num_frames": FRAMES,
                             "loading": "strict"}}}],
        "optimizer": {"type": "AdamW", "args": {"lr": 1e-3}},
        "loss": {"type": "NormSoftmaxLoss"},
        "metrics": ["t2v_metrics", "v2t_metrics"],
        "trainer": {"epochs": 1, "save_dir": str(tmp_path / "e"),
                    "monitor": "off", "precision": "f32", "verbosity": 2},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    sims_path = tmp_path / "sims.npy"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["OATX_PLATFORM"] = "cpu"  # in-code pin; JAX_PLATFORMS alone is overridden by the axon sitecustomize
    out = subprocess.run(
        [sys.executable, "-m", "oatx.cli.test", "-c", str(cfg_path),
         "--sims_out", str(sims_path)],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=900)
    assert out.returncode == 0, out.stderr[-3000:]
    sims_oatx = np.load(str(sims_path))
    assert sims_oatx.shape == sims_ref.shape == (N_VIDS, N_VIDS)

    # ---------------- rank-ordering parity, both directions
    # The two pipelines share no resize/model/metric code, so scores carry a
    # small cross-pipeline deviation; pairs the reference separates by more
    # than a margin derived from that measured deviation must order
    # identically, and the margin must leave the vast majority of pairs
    # decided (i.e. the check cannot pass vacuously on an all-ties matrix).
    dev = float(np.abs(sims_oatx - sims_ref).max())
    assert dev < 0.05, f"pipelines diverged grossly (max |Δsim| = {dev:.3f})"
    margin = 2.5 * dev

    def assert_pair_order(ref, got, axis, what, min_decided):
        if axis == 0:
            ref, got = ref.T, got.T
        g_ref = ref[:, :, None] - ref[:, None, :]
        g_got = got[:, :, None] - got[:, None, :]
        offdiag = ~np.eye(ref.shape[1], dtype=bool)[None]
        decided = (np.abs(g_ref) > margin) & offdiag
        frac = decided.sum() / offdiag.sum() / ref.shape[0]
        # anti-vacuity guard: enough pairs must be separated or the flip
        # check below means nothing
        assert frac > min_decided, (
            f"{what}: only {frac:.0%} of pairs decided (margin {margin:.4f})")
        flips = np.sign(g_got[decided]) != np.sign(g_ref[decided])
        assert not flips.any(), (
            f"{what}: {flips.sum()}/{decided.sum()} decided pairs flipped order")

    # video-side scores are widely separated (distinct fixture content);
    # caption-side scores cluster for a tiny random text tower, so the bar is
    # lower there — the flip check is the contract either way
    assert_pair_order(sims_ref, sims_oatx, axis=1,
                      what="t2v (videos per caption)", min_decided=0.75)
    assert_pair_order(sims_ref, sims_oatx, axis=0,
                      what="v2t (captions per video)", min_decided=0.3)

    # Retrieval-metric-relevant contract: the GT video's rank among the
    # competitors the reference separates from it by more than the margin
    # must be identical across pipelines (this is what R@K/MedR count).
    gt_scores_ref = sims_ref[np.arange(N_VIDS), np.arange(N_VIDS)][:, None]
    gt_scores_oatx = sims_oatx[np.arange(N_VIDS), np.arange(N_VIDS)][:, None]
    decided_comp = np.abs(sims_ref - gt_scores_ref) > margin
    frac = decided_comp.sum() / (N_VIDS * (N_VIDS - 1))
    assert frac > 0.6, f"only {frac:.0%} of GT-competitor pairs decided"
    rank_ref = ((sims_ref > gt_scores_ref) & decided_comp).sum(axis=1)
    rank_oatx = ((sims_oatx > gt_scores_oatx) & decided_comp).sum(axis=1)
    np.testing.assert_array_equal(
        rank_oatx, rank_ref,
        err_msg="GT video rank (among decided competitors) differs")

    # and the reference's own metric.py must agree with the CLI-reported
    # metrics when both are computed from the SAME sims (implementation
    # parity at the end of the full pipeline; cross-pipeline rank agreement
    # is covered by the margin checks above)
    from test_metrics import _load_reference_metric_module

    ref_metric = _load_reference_metric_module()
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    cli_metrics = json.loads(line)
    if ref_metric is not None:
        want = ref_metric.t2v_metrics(sims_oatx)
        for k in ("R1", "R5", "R10", "MedR"):
            assert cli_metrics["t2v_metrics"][k] == pytest.approx(want[k], abs=1e-3), k


def test_identical_frames_hard_cosine_gate(pipeline_root, torch_models):
    """HARD parity gate with the decode stage removed (VERDICT r2 weak #5):
    on IDENTICAL canonical uint8 frames and captions, the composed remaining
    pipeline — device eval transform + torch-weight converter + towers +
    projections — must match the reference's torch pipeline to cosine >=
    0.999 per embedding. Unlike the rank-order test above, no margin exists
    for drift to hide under; this is the real-weights validation contract
    (docs/real_weights.md) made executable on random-init weights."""
    import jax
    import jax.numpy as jnp
    import torch.nn.functional as F

    from oatx.data.tokenizer import WordPieceTokenizer
    from oatx.models import convert, distilbert as dbert, towers
    from oatx.models import vit_spacetime as vst
    from oatx.train import step as steplib

    video_model, text_model, txt_proj, vid_proj = torch_models
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (N_VIDS, FRAMES, 256, 256, 3)).astype(np.uint8)

    # ------- reference torch pipeline on the canonical frames
    tok = WordPieceTokenizer.from_vocab_file(str(pipeline_root / "vocab.txt"))
    enc = tok(CAPTIONS, max_length=30)
    with torch.no_grad():
        h = text_model(
            torch.from_numpy(np.asarray(enc["input_ids"])),
            attention_mask=torch.from_numpy(np.asarray(enc["attention_mask"]))
        ).last_hidden_state
        t_ref = txt_proj(h[:, 0, :]).numpy()
        x = torch.from_numpy(frames.astype(np.float32) / 255.0)
        x = x.permute(0, 1, 4, 2, 3).reshape(-1, 3, 256, 256)
        x = F.interpolate(x, size=(INPUT_RES, INPUT_RES), mode="bilinear",
                          align_corners=False)
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        x = ((x - mean) / std).reshape(N_VIDS, FRAMES, 3, INPUT_RES, INPUT_RES)
        cls, _ = video_model.forward_features(x)
        v_ref = vid_proj(cls).numpy()

    # ------- oatx pipeline: converter -> device eval transform -> towers
    sd = {}
    for prefix, m in (("video_model.", video_model), ("text_model.", text_model),
                      ("txt_proj.", txt_proj), ("vid_proj.", vid_proj)):
        for k, v in m.state_dict().items():
            sd[prefix + k] = v.numpy()
    vcfg = vst.SpaceTimeViTConfig(
        img_size=INPUT_RES, embed_dim=EMBED, depth=2, num_heads=4,
        num_frames=FRAMES, time_init="random")
    tcfg = dbert.DistilBertConfig(dim=EMBED, hidden_dim=2 * EMBED,
                                  n_layers=2, n_heads=4)
    params = convert.frozen_in_time_from_torch(sd, vcfg, tcfg,
                                               temporal_fix="random")
    cfg = towers.TowerConfig(video=vcfg, text=tcfg, projection_dim=32)
    aug = steplib.make_augmenter(train=False, tower_cfg=cfg)
    batch = aug(jax.random.PRNGKey(0), {
        "video": jnp.asarray(frames),
        "input_ids": jnp.asarray(np.asarray(enc["input_ids"])),
        "attention_mask": jnp.asarray(np.asarray(enc["attention_mask"]))})
    t_oatx, v_oatx = jax.jit(
        lambda p, b: towers.forward_baseline(p, cfg, b))(params, batch)
    t_oatx, v_oatx = np.asarray(t_oatx), np.asarray(v_oatx)

    def row_cosines(a, b):
        a = a / np.linalg.norm(a, axis=1, keepdims=True)
        b = b / np.linalg.norm(b, axis=1, keepdims=True)
        return (a * b).sum(axis=1)

    ct = row_cosines(t_ref, t_oatx)
    cv = row_cosines(v_ref, v_oatx)
    assert ct.min() >= 0.999, f"text cosines {ct}"
    assert cv.min() >= 0.999, f"video cosines {cv}"
