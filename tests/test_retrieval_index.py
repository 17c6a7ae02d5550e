"""Corpus retrieval index (oatx/serve/retrieval_index.py): search correctness
vs a numpy oracle, pad-row masking, the chunked large-corpus scoring path,
incremental add without recompile, persistence, id derivation from eval
results, and the /search + /index_video HTTP endpoints."""

import json

import numpy as np
import pytest

from oatx.serve.retrieval_index import RetrievalIndex, ids_for_result


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _oracle_topk(corpus, queries, k):
    c = corpus / np.linalg.norm(corpus, axis=-1, keepdims=True)
    q = queries / np.linalg.norm(queries, axis=-1, keepdims=True)
    sims = q @ c.T
    idx = np.argsort(-sims, axis=1, kind="stable")[:, :k]
    return idx, np.take_along_axis(sims, idx, axis=1)


def test_search_matches_numpy_oracle(rng):
    corpus = rng.standard_normal((50, 16)).astype(np.float32)
    queries = rng.standard_normal((3, 16)).astype(np.float32)
    idx = RetrievalIndex(corpus, [f"v{i}" for i in range(50)], pad_multiple=16)
    res = idx.search(queries, k=5)
    oracle_idx, oracle_scores = _oracle_topk(corpus, queries, 5)
    for qi, row in enumerate(res):
        assert [r["id"] for r in row] == [f"v{j}" for j in oracle_idx[qi]]
        np.testing.assert_allclose(
            [r["score"] for r in row], oracle_scores[qi], atol=1e-5)
        assert [r["rank"] for r in row] == list(range(5))


def test_pad_rows_never_returned_and_k_clamped(rng):
    # 5 valid rows in a pad-16 buffer; k=8 must clamp to 5 and every hit valid
    corpus = rng.standard_normal((5, 8)).astype(np.float32)
    idx = RetrievalIndex(corpus, list("abcde"), pad_multiple=16)
    rows = idx.search(rng.standard_normal((2, 8)).astype(np.float32), k=8)
    for row in rows:
        assert len(row) == 5
        assert sorted(r["id"] for r in row) == list("abcde")
        assert all(np.isfinite(r["score"]) for r in row)


def test_chunked_scoring_matches_unchunked(rng):
    corpus = rng.standard_normal((40, 12)).astype(np.float32)
    queries = rng.standard_normal((4, 12)).astype(np.float32)
    ids = [f"v{i}" for i in range(40)]
    # pad 40 -> 48 = 6 chunks of 8 through the lax.map merge path
    chunked = RetrievalIndex(corpus, ids, pad_multiple=8, score_chunk=8)
    plain = RetrievalIndex(corpus, ids, pad_multiple=8, score_chunk=1 << 20)
    a = chunked.search(queries, k=7)
    b = plain.search(queries, k=7)
    for ra, rb in zip(a, b):
        assert [r["id"] for r in ra] == [r["id"] for r in rb]
        np.testing.assert_allclose([r["score"] for r in ra],
                                   [r["score"] for r in rb], atol=1e-5)


def test_add_grows_without_recompile_within_bucket(rng):
    idx = RetrievalIndex(pad_multiple=64, query_buckets=(1, 4))
    idx.add(rng.standard_normal((10, 8)).astype(np.float32),
            [f"a{i}" for i in range(10)])
    q = rng.standard_normal((1, 8)).astype(np.float32)
    idx.search(q, k=3)
    n_graphs = len(idx._search_cache)
    idx.add(rng.standard_normal((20, 8)).astype(np.float32),
            [f"b{i}" for i in range(20)])
    rows = idx.search(q, k=3)
    assert len(idx._search_cache) == n_graphs  # same pad bucket → same graph
    assert len(idx) == 30 and len(rows[0]) == 3
    # the new rows are actually searchable: query WITH a new row's embedding
    target = idx._emb[15:16] * 10.0
    hit = idx.search(target, k=1)[0][0]
    assert hit["id"] == "b5"


def test_query_batch_bucketing_and_oversize(rng):
    corpus = rng.standard_normal((20, 8)).astype(np.float32)
    idx = RetrievalIndex(corpus, [f"v{i}" for i in range(20)],
                         pad_multiple=8, query_buckets=(1, 4))
    queries = rng.standard_normal((9, 8)).astype(np.float32)  # > bucket 4
    rows = idx.search(queries, k=2)
    assert len(rows) == 9
    singles = [idx.search(queries[i: i + 1], k=2)[0] for i in range(9)]
    for got, want in zip(rows, singles):
        assert [r["id"] for r in got] == [r["id"] for r in want]


def test_save_load_roundtrip(tmp_path, rng):
    corpus = rng.standard_normal((6, 8)).astype(np.float32)
    idx = RetrievalIndex(corpus, [f"v{i}" for i in range(6)], pad_multiple=4)
    path = str(tmp_path / "corpus.npz")
    idx.save(path)
    idx2 = RetrievalIndex.load(path)
    assert idx2.ids == idx.ids and idx2.pad_multiple == 4
    q = rng.standard_normal((1, 8)).astype(np.float32)
    a, b = idx.search(q, k=3)[0], idx2.search(q, k=3)[0]
    assert [r["id"] for r in a] == [r["id"] for r in b]


def test_input_validation(rng):
    idx = RetrievalIndex(pad_multiple=4)
    with pytest.raises(ValueError, match="empty"):
        idx.search(np.zeros((1, 4), np.float32))
    idx.add(rng.standard_normal((3, 4)).astype(np.float32), list("abc"))
    with pytest.raises(ValueError, match="dim"):
        idx.search(np.zeros((1, 8), np.float32))
    with pytest.raises(ValueError, match="dim mismatch"):
        idx.add(np.zeros((1, 8), np.float32), ["x"])
    with pytest.raises(ValueError, match="ids"):
        idx.add(np.zeros((2, 4), np.float32), ["only_one"])


def test_ids_for_result_variants():
    import dataclasses

    @dataclasses.dataclass
    class FakeResult:
        video_embeds: np.ndarray
        meta: list

    # plain: one row per sample
    res = FakeResult(np.zeros((3, 4)), [{"paths": f"p{i}"} for i in range(3)])
    assert ids_for_result(res) == ["p0", "p1", "p2"]
    # window-ensembled: rows collapse to first-appearance group order
    metas = [{"paths": "a", "window_group": 0}, {"paths": "a2", "window_group": 0},
             {"paths": "b", "window_group": 1}, {"paths": "b2", "window_group": 1}]
    res = FakeResult(np.zeros((2, 4)), metas)
    assert ids_for_result(res) == ["a", "b"]
    # mismatched collapse falls back to per-row ids
    res = FakeResult(np.zeros((4, 4)), metas)
    assert ids_for_result(res) == ["a", "a2", "b", "b2"]


def test_http_search_endpoints(rng):
    """Real HTTP round trips for /search and /index_video through cli.serve's
    handler, against a tiny live EmbedService + index."""
    import base64
    import io
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    import jax

    from oatx.cli.serve import _Handler
    from oatx.data.tokenizer import WordPieceTokenizer
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

    clips = rng.integers(0, 255, (3, 2, 64, 64, 3)).astype(np.uint8)
    corpus = svc.embed_video(clips)
    index = RetrievalIndex(corpus, ["c0", "c1", "c2"], pad_multiple=8)

    prev = (_Handler.service, _Handler.tokenizer, _Handler.index)
    _Handler.service = svc
    _Handler.tokenizer = WordPieceTokenizer.build_from_corpus(
        [f"a dog runs in scene {i}" for i in range(20)], vocab_size=64)
    _Handler.index = index
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

        out = post("/search", {"texts": ["a dog runs"], "k": 2})
        (row,) = out["results"]
        assert len(row) == 2 and {r["id"] for r in row} <= {"c0", "c1", "c2"}
        assert row[0]["score"] >= row[1]["score"]

        # live indexing: add a clip, then its id must be findable
        buf = io.BytesIO()
        np.save(buf, clips[:1])
        out = post("/index_video",
                   {"video_b64": base64.b64encode(buf.getvalue()).decode(),
                    "ids": ["fresh"]})
        assert out == {"indexed": 1, "size": 4}
        out = post("/search", {"texts": ["a dog runs"], "k": 4})
        assert {r["id"] for r in out["results"][0]} == {"c0", "c1", "c2", "fresh"}

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["index"] == {"size": 4, "dim": 8}
    finally:
        server.shutdown()
        server.server_close()
        _Handler.service, _Handler.tokenizer, _Handler.index = prev


# ---- int8 corpus quantization ------------------------------------------


def test_int8_index_ranking_agreement(rng):
    """SQ8 corpus: top-k must agree with the f32 index on a random corpus —
    structure/ranking assertions, never exact scores (CLAUDE.md conventions).
    Covers both the plain and chunked scoring paths."""
    corpus = rng.standard_normal((96, 32)).astype(np.float32)
    queries = rng.standard_normal((5, 32)).astype(np.float32)
    ids = [f"v{i}" for i in range(96)]
    full = RetrievalIndex(corpus, ids, pad_multiple=16)
    for kwargs in ({"score_chunk": 1 << 20}, {"score_chunk": 16}):
        q8 = RetrievalIndex(corpus, ids, pad_multiple=16, quantize="int8",
                            **kwargs)
        got = q8.search(queries, k=5)
        want = full.search(queries, k=5)
        for grow, wrow in zip(got, want):
            # top-1 identical; top-5 sets near-identical (ties may swap tail)
            assert grow[0]["id"] == wrow[0]["id"]
            assert len({r["id"] for r in grow}
                       & {r["id"] for r in wrow}) >= 4
            for g, w in zip(grow, wrow):  # scores track within SQ8 noise
                assert abs(g["score"] - w["score"]) < 0.02


def test_int8_index_save_load_roundtrip(rng, tmp_path):
    corpus = rng.standard_normal((10, 8)).astype(np.float32)
    idx = RetrievalIndex(corpus, [f"v{i}" for i in range(10)],
                         pad_multiple=4, quantize="int8")
    path = tmp_path / "idx.npz"
    idx.save(str(path))
    back = RetrievalIndex.load(str(path))
    assert back.quantize == "int8"  # persisted in meta
    q = rng.standard_normal((2, 8)).astype(np.float32)
    assert [r[0]["id"] for r in back.search(q, k=3)] == \
           [r[0]["id"] for r in idx.search(q, k=3)]
    # load-time override: serve a f32-saved index quantized
    f32 = RetrievalIndex(corpus, [f"v{i}" for i in range(10)], pad_multiple=4)
    f32.save(str(tmp_path / "f32.npz"))
    over = RetrievalIndex.load(str(tmp_path / "f32.npz"), quantize="int8")
    assert over.quantize == "int8"
    assert over.search(q, k=1)[0][0]["id"] == f32.search(q, k=1)[0][0]["id"]


def test_int8_index_rejects_unknown_mode():
    with pytest.raises(ValueError):
        RetrievalIndex(quantize="fp4")


def test_int8_incremental_add(rng):
    """add() after a quantized search must re-derive the int8 corpus (the
    device buffer is a serving-time layout, not state)."""
    corpus = rng.standard_normal((8, 8)).astype(np.float32)
    idx = RetrievalIndex(corpus, [f"v{i}" for i in range(8)],
                         pad_multiple=4, quantize="int8")
    q = rng.standard_normal((1, 8)).astype(np.float32)
    idx.search(q, k=2)
    new = rng.standard_normal((1, 8)).astype(np.float32)
    idx.add(new, ["fresh"])
    hits = idx.search(new, k=1)
    assert hits[0][0]["id"] == "fresh"  # exact self-match survives int8
