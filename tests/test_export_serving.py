"""AOT serving artifact (oatx.serve.export): jax.export round trip.

The artifact must serve ANY batch size from one shape-polymorphic graph,
match the in-process towers numerically, and plug into cli.serve's HTTP
handler unchanged (no model code on the inference path). The reference has
no deployment packaging at all (SURVEY.md §2 — offline eval scripts only).
"""

import json

import numpy as np
import pytest

import jax

from oatx.models import distilbert as dbert, towers, vit_spacetime as vst


CANON, FRAMES, SEQ = 64, 2, 8


@pytest.fixture(scope="module")
def tiny_cfg_params():
    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(img_size=32, patch_size=16, embed_dim=32,
                                     depth=1, num_heads=2, num_frames=FRAMES),
        text=dbert.DistilBertConfig(vocab_size=64, max_position_embeddings=16,
                                    dim=32, hidden_dim=64, n_layers=1, n_heads=2),
        projection_dim=8,
    )
    return cfg, towers.init(jax.random.PRNGKey(0), cfg)


@pytest.fixture(scope="module")
def artifact(tiny_cfg_params, tmp_path_factory):
    from oatx.serve.export import save_artifact

    cfg, params = tiny_cfg_params
    out = save_artifact(tmp_path_factory.mktemp("aot") / "artifact", params,
                        cfg, frames=FRAMES, canon=CANON, seq_len=SEQ)
    return out


def _reference_video(cfg, params, v):
    from oatx.train.step import make_augmenter

    aug = make_augmenter(train=False, tower_cfg=cfg)
    batch = aug(jax.random.PRNGKey(0), {"video": v})
    return np.asarray(towers.compute_video(params, cfg, batch["video"])["cls"])


def test_artifact_layout_and_meta(artifact):
    names = {p.name for p in artifact.iterdir()}
    assert {"video.stablehlo", "text.stablehlo", "params.npz",
            "meta.json"} <= names
    meta = json.loads((artifact / "meta.json").read_text())
    assert meta["frames"] == FRAMES and meta["seq_len"] == SEQ
    assert "cpu" in meta["platforms"]  # native platform always present


def test_roundtrip_matches_and_batch_polymorphic(artifact, tiny_cfg_params, rng):
    from oatx.serve.export import ExportedEmbedder

    cfg, params = tiny_cfg_params
    emb = ExportedEmbedder(artifact)
    # two different batch sizes through ONE exported graph (symbolic batch)
    for bs in (2, 3):
        v = rng.integers(0, 255, (bs, FRAMES, CANON, CANON, 3)).astype(np.uint8)
        out = emb.embed_video(v)
        assert out.shape == (bs, cfg.projection_dim)
        np.testing.assert_allclose(out, _reference_video(cfg, params, v),
                                   rtol=1e-5, atol=1e-5)
    ids = rng.integers(0, 64, (3, SEQ)).astype(np.int32)
    mask = np.ones_like(ids)
    te = emb.embed_text(ids, mask)
    ref = np.asarray(towers.compute_text(params, cfg, ids, mask))
    np.testing.assert_allclose(te, ref, rtol=1e-5, atol=1e-5)
    s = emb.latency_summary()
    assert s["video"]["count"] == 2 and s["text"]["count"] == 1


def test_text_pads_and_trims_to_exported_len(artifact, rng):
    from oatx.serve.export import ExportedEmbedder

    emb = ExportedEmbedder(artifact)
    short = rng.integers(1, 64, (2, SEQ - 3)).astype(np.int32)
    long = np.concatenate([short, np.ones((2, 6), np.int32)], axis=1)
    assert emb.embed_text(short, np.ones_like(short)).shape == (2, 8)
    assert emb.embed_text(long, np.ones_like(long)).shape == (2, 8)
    # padding is zeros (mask 0): a short request equals its explicitly padded form
    padded = np.zeros((2, SEQ), np.int32)
    padded[:, : SEQ - 3] = short
    m = np.zeros((2, SEQ), np.int32)
    m[:, : SEQ - 3] = 1
    np.testing.assert_allclose(
        emb.embed_text(short, np.ones_like(short)),
        emb.embed_text(padded, m), rtol=1e-6)


def test_video_shape_validated(artifact, rng):
    from oatx.serve.export import ExportedEmbedder

    emb = ExportedEmbedder(artifact)
    bad = rng.integers(0, 255, (1, FRAMES, 32, 32, 3)).astype(np.uint8)
    with pytest.raises(ValueError, match="exported"):
        emb.embed_video(bad)


def test_startup_banner_both_backends(artifact, tiny_cfg_params):
    """cli.serve's startup banner must work for BOTH backends — the artifact
    backend has no compile buckets (symbolic batch), which used to crash
    main() with AttributeError before the socket ever opened."""
    from types import SimpleNamespace

    from oatx.cli.serve import startup_banner
    from oatx.serve.embed_service import EmbedService
    from oatx.serve.export import ExportedEmbedder

    our = SimpleNamespace(host="127.0.0.1", port=8600)
    d = json.loads(startup_banner(ExportedEmbedder(artifact), None, our))
    assert d["buckets"] == [] and d["index_size"] is None
    cfg, params = tiny_cfg_params
    svc = EmbedService(params, cfg, buckets=(2, 1), seq_len=SEQ)
    d2 = json.loads(startup_banner(svc, None, our))
    assert d2["buckets"] == [1, 2]


def test_http_serve_from_artifact(artifact, rng):
    """cli.serve's handler runs unchanged on the artifact backend — the
    --artifact serving path end-to-end over real HTTP."""
    import base64
    import io
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from oatx.cli.serve import _Handler
    from oatx.data.tokenizer import WordPieceTokenizer
    from oatx.serve.export import ExportedEmbedder

    prev = (_Handler.service, _Handler.tokenizer)
    _Handler.service = ExportedEmbedder(artifact)
    _Handler.tokenizer = WordPieceTokenizer.build_from_corpus(
        [f"a dog runs in scene {i}" for i in range(20)], vocab_size=64)
    server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=60) as r:
                return json.loads(r.read())

        out = post("/embed_text", {"texts": ["a dog runs"] * 5})
        assert np.asarray(out["embeddings"]).shape == (5, 8)
        buf = io.BytesIO()
        np.save(buf, rng.integers(0, 255, (2, FRAMES, CANON, CANON, 3))
                .astype(np.uint8))
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
        _Handler.service, _Handler.tokenizer = prev
