import json
import os

import numpy as np
import pytest


def test_jet_colormap_endpoints():
    from oatx.visualization.heatmap import jet_colormap

    lo = jet_colormap(np.array(0.0))
    hi = jet_colormap(np.array(1.0))
    mid = jet_colormap(np.array(0.5))
    assert lo[2] > 100 and lo[0] < 50     # dark blue at 0
    assert hi[0] > 100 and hi[2] < 50     # dark red at 1
    assert mid[1] > 200                   # green mid


def test_word_patch_attention_sums_to_one(rng):
    from oatx.visualization.heatmap import word_patch_attention

    attn = word_patch_attention(rng.standard_normal(64), rng.standard_normal((196, 64)))
    assert attn.shape == (196,)
    assert attn.sum() == pytest.approx(1.0, abs=1e-5)
    assert (attn >= 0).all()


def test_render_heatmap_frame(rng, tmp_path):
    from oatx.visualization.heatmap import render_caption_heatmaps, render_heatmap_frame

    frame = rng.integers(0, 255, (224, 224, 3)).astype(np.uint8)
    attn = rng.uniform(size=196)
    attn /= attn.sum()
    panel = render_heatmap_frame(attn, frame, label="dog", caption="a dog runs")
    assert panel.shape == (224 + 50, 448, 3)

    paths = render_caption_heatmaps(
        "a dog runs", [rng.standard_normal(64) for _ in range(3)],
        rng.standard_normal((196, 64)), frame, str(tmp_path / "hm"))
    assert len(paths) >= 1 and all(os.path.exists(p) for p in paths)


def test_noun_filter():
    from oatx.visualization.heatmap import is_probable_noun

    assert is_probable_noun("dog")
    assert not is_probable_noun("the")
    assert not is_probable_noun("is")


def test_binary_map(rng, tmp_path):
    from oatx.visualization.binary_map import save_binary_map

    frame = rng.integers(0, 255, (96, 128, 3)).astype(np.uint8)
    gt = (rng.uniform(size=196) > 0.7).astype(np.float32)
    pred = rng.uniform(size=196).astype(np.float32)
    p = save_binary_map(str(tmp_path / "bm.png"), frame, gt, pred, label="cat")
    assert os.path.exists(p)
    from PIL import Image

    im = np.asarray(Image.open(p))
    assert im.shape == (224, 672, 3)


def test_retrieval_vis_html(rng, tmp_path):
    from oatx.utils.html_viz import RetrievalVis

    vis = RetrievalVis(str(tmp_path), top_k=3)
    sims = rng.standard_normal((4, 4))
    caps = [f"caption {i}" for i in range(4)]
    vids = [f"videos/{i}.mp4" for i in range(4)]
    vis.from_sims(sims, caps, vids)
    out = vis.write()
    content = open(out).read()
    assert "caption 0" in content and "<video" in content
    assert content.count('class="query"') == 4


def test_tracker(tmp_path):
    from oatx.utils.tracking import ExperimentTracker

    with ExperimentTracker(tmp_path, "t", {"lr": 1e-4}) as tr:
        tr.log_metrics(1, {"loss": 2.0})
        tr.log_artifact("x.png")
    lines = [json.loads(l) for l in open(tmp_path / "events.jsonl")]
    kinds = [l["kind"] for l in lines]
    assert kinds == ["run_start", "metrics", "artifact", "run_end"]
    assert lines[-1]["status"] == "completed"


def test_step_timer():
    from oatx.utils.profiler import StepTimer

    t = StepTimer()
    assert t.mark() is None
    import time

    time.sleep(0.01)
    dt = t.mark()
    assert dt is not None and dt > 0
    assert t.steps_per_sec() > 0


@pytest.fixture(scope="module")
def tiny_service():
    import jax

    from oatx.models import distilbert as dbert, towers, vit_spacetime as vst
    from oatx.serve.embed_service import EmbedService

    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(img_size=32, patch_size=16, embed_dim=32,
                                     depth=1, num_heads=2, num_frames=2),
        text=dbert.DistilBertConfig(vocab_size=64, max_position_embeddings=16,
                                    dim=32, hidden_dim=64, n_layers=1, n_heads=2),
        projection_dim=8,
    )
    params = towers.init(jax.random.PRNGKey(0), cfg)
    svc = EmbedService(params, cfg, buckets=(1, 4), seq_len=8)
    svc.warmup(frames=2, canon=64)
    return svc


def test_embed_service(tiny_service, rng):
    svc = tiny_service
    v = rng.integers(0, 255, (3, 2, 64, 64, 3)).astype(np.uint8)
    out = svc.embed_video(v)
    assert out.shape == (3, 8)
    ids = rng.integers(0, 64, (2, 8)).astype(np.int32)
    te = svc.embed_text(ids, np.ones_like(ids))
    assert te.shape == (2, 8)
    s = svc.latency_summary()
    assert s["video"]["count"] >= 1 and np.isfinite(s["video"]["p50_ms"])


def test_micro_batcher(tiny_service, rng):
    import threading

    from oatx.serve.embed_service import MicroBatcher

    mb = MicroBatcher(tiny_service, max_batch=4, max_wait_ms=20)
    clips = rng.integers(0, 255, (4, 2, 64, 64, 3)).astype(np.uint8)
    results = [None] * 4

    def call(i):
        results[i] = mb.submit(clips[i])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    [t.start() for t in threads]
    [t.join(timeout=30) for t in threads]
    assert all(r is not None and r.shape == (8,) for r in results)
    # coalesced results must equal direct batch embedding
    direct = tiny_service.embed_video(clips)
    for i in range(4):
        np.testing.assert_allclose(results[i], direct[i], atol=1e-5)
    mb.close()


def test_embed_service_oversize_batch_chunks(tiny_service, rng):
    """Batches beyond the largest bucket process in largest-bucket chunks, so
    only len(buckets) XLA graphs ever compile (no fresh compile per size)."""
    svc = tiny_service
    v = rng.integers(0, 255, (11, 2, 64, 64, 3)).astype(np.uint8)  # > bucket 4
    out = svc.embed_video(v)
    assert out.shape == (11, 8)
    direct = np.concatenate([svc.embed_video(v[i: i + 4]) for i in range(0, 11, 4)])
    np.testing.assert_allclose(out, direct, atol=1e-6)


def test_micro_batcher_survives_bad_request(tiny_service, rng):
    """A shape-mismatched submission fails ITS caller but must not kill the
    batcher thread (which would deadlock every later submit)."""
    import threading

    from oatx.serve.embed_service import MicroBatcher

    mb = MicroBatcher(tiny_service, max_batch=2, max_wait_ms=10)
    good = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)  # (F,H,W,C)
    bad = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)   # wrong res
    res = {}

    def call(key, clip):
        try:
            res[key] = mb.submit(clip)
        except Exception as ex:  # submit re-raises per-request failures
            res[key] = ex

    t1 = threading.Thread(target=call, args=("good", good))
    t2 = threading.Thread(target=call, args=("bad", bad))
    t1.start(); t2.start()
    t1.join(timeout=30); t2.join(timeout=30)
    # every caller got an answer (value or error) — nobody hung
    assert "good" in res and "bad" in res
    assert any(isinstance(v, Exception) for v in res.values())
    # the batcher thread is still alive: a fresh clean request completes
    again = mb.submit(good)
    assert hasattr(again, "shape") and again.shape == (8,)
    mb.close()


def test_http_serve_endpoints(tiny_service, rng):
    """Real HTTP round trips through cli.serve's handler: health, text with a
    client max_length beyond the warmed length (clamped, no recompile), an
    oversize text batch (chunked), video, and stats."""
    import base64
    import io
    import json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from oatx.cli.serve import _Handler
    from oatx.data.tokenizer import WordPieceTokenizer

    prev = (_Handler.service, _Handler.tokenizer)
    _Handler.service = tiny_service
    _Handler.tokenizer = WordPieceTokenizer.build_from_corpus(
        [f"a dog runs in scene {i}" for i in range(20)], vocab_size=64)
    server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=60) as r:
                return json.loads(r.read())

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            assert json.loads(r.read())["status"] == "ok"

        # max_length=100 > warmed seq_len=8 must clamp, not recompile
        out = post("/embed_text", {"texts": ["a dog runs"] * 6,
                                   "max_length": 100})
        assert np.asarray(out["embeddings"]).shape == (6, 8)

        buf = io.BytesIO()
        np.save(buf, rng.integers(0, 255, (2, 2, 64, 64, 3)).astype(np.uint8))
        out = post("/embed_video",
                   {"video_b64": base64.b64encode(buf.getvalue()).decode()})
        assert np.asarray(out["embeddings"]).shape == (2, 8)

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["video"]["count"] >= 1
    finally:
        server.shutdown()
        server.server_close()
        _Handler.service, _Handler.tokenizer = prev  # no cross-test leakage


def test_bucket_chunk_planning(tiny_service):
    """High-waste coalesced batches decompose into smaller buckets (measured:
    8 padded to bucket 16 halved qps under load — PERF.md r3); degenerate
    all-unit plans and low-waste pads stay single calls."""
    from oatx.serve.embed_service import EmbedService

    svc = EmbedService(tiny_service.params, tiny_service.cfg,
                       buckets=(1, 4, 16), seq_len=8)
    assert svc._chunks(16) == [16]
    assert svc._chunks(4) == [4]
    assert svc._chunks(1) == [1]
    assert svc._chunks(8) == [4, 4]
    assert svc._chunks(9) == [4, 4, 1]
    assert svc._chunks(12) == [4, 4, 4]
    assert svc._chunks(3) == [3]     # 1+1+1 would cost more than one pad-to-4
    assert svc._chunks(14) == [14]   # low waste: keep the single padded call


def test_embed_video_decomposed_matches_per_row(tiny_service, rng):
    from oatx.serve.embed_service import EmbedService

    svc = EmbedService(tiny_service.params, tiny_service.cfg,
                       buckets=(1, 4, 16), seq_len=8)
    v = rng.integers(0, 255, (8, 2, 64, 64, 3)).astype(np.uint8)
    assert svc._chunks(8) == [4, 4]
    out = svc.embed_video(v)  # decomposed 4+4 path
    assert out.shape == (8, 8)
    per_row = np.concatenate([svc.embed_video(v[i: i + 1]) for i in range(8)])
    np.testing.assert_allclose(out, per_row, atol=1e-5)
    # oversize path still chunks by the largest bucket
    v21 = rng.integers(0, 255, (21, 2, 64, 64, 3)).astype(np.uint8)
    assert svc.embed_video(v21).shape == (21, 8)
