import numpy as np
import pytest

from oatx.metrics.retrieval import (
    acc,
    cols2metrics,
    mean_average_precision,
    retrieval_as_classification,
    t2v_metrics,
    top_k_acc,
    v2t_metrics,
)


def _reference_t2v(sims, query_masks=None):
    """Literal transcription of reference t2v_metrics (metric.py:16-120),
    optimistic tie-breaking, used as golden oracle."""
    num_queries, num_vids = sims.shape
    dists = -sims
    sorted_dists = np.sort(dists, axis=1)
    queries_per_video = num_queries // num_vids
    gt_idx = [
        [
            np.ravel_multi_index([ii, jj], (num_queries, num_vids))
            for ii in range(jj * queries_per_video, (jj + 1) * queries_per_video)
        ]
        for jj in range(num_vids)
    ]
    gt_idx = np.array(gt_idx)
    gt_dists = dists.reshape(-1)[gt_idx.reshape(-1)]
    gt_dists = gt_dists[:, np.newaxis]
    rows, cols = np.where((sorted_dists - gt_dists) == 0)
    if rows.size > num_queries:
        _, idx = np.unique(rows, return_index=True)
        cols = cols[idx]
    if query_masks is not None:
        cols = cols[query_masks.reshape(-1).astype(bool)]
        num_queries = int(query_masks.sum())
    return cols2metrics(cols, num_queries)


def test_t2v_identity_sims():
    sims = np.eye(10)
    m = t2v_metrics(sims)
    assert m["R1"] == 100.0
    assert m["MedR"] == 1.0


def test_t2v_matches_reference_random():
    rng = np.random.default_rng(0)
    for _ in range(5):
        sims = rng.standard_normal((40, 40))
        got = t2v_metrics(sims)
        want = _reference_t2v(sims)
        for k in want:
            assert got[k] == pytest.approx(want[k]), k


def test_t2v_matches_reference_rectangular():
    rng = np.random.default_rng(1)
    sims = rng.standard_normal((60, 20))  # 3 captions per video
    got = t2v_metrics(sims)
    want = _reference_t2v(sims)
    for k in want:
        assert got[k] == pytest.approx(want[k]), k


def test_t2v_with_ties_optimistic():
    sims = np.zeros((5, 5))  # all tied → optimistic says rank 0 for everyone
    m = t2v_metrics(sims)
    assert m["R1"] == 100.0


def test_t2v_query_masks():
    rng = np.random.default_rng(2)
    sims = rng.standard_normal((40, 20))
    masks = np.ones(40)
    masks[::7] = 0
    got = t2v_metrics(sims, query_masks=masks)
    want = _reference_t2v(sims, query_masks=masks)
    for k in want:
        assert got[k] == pytest.approx(want[k]), k


def test_v2t_identity():
    m = v2t_metrics(np.eye(8))
    assert m["R1"] == pytest.approx(100.0)


def test_v2t_picks_best_caption():
    # 2 captions per video, second caption is the well-ranked one
    sims = np.zeros((4, 2))
    sims[0, 0] = 0.1   # video 0 captions are rows 0,1
    sims[1, 0] = 0.9
    sims[2, 1] = 0.9
    sims[3, 1] = 0.1
    m = v2t_metrics(sims)
    assert m["R1"] == pytest.approx(100.0)


def test_v2t_averaging_ties():
    sims = np.zeros((3, 3))
    m = v2t_metrics(sims)
    # all tied: averaged rank (0+1+2)/3 = 1 → R1 = 0
    assert m["R1"] == 0.0
    assert m["MedR"] == 2.0


def test_cols2metrics_values():
    cols = np.array([0, 0, 4, 9, 49, 100])
    m = cols2metrics(cols, 6)
    assert m["R1"] == pytest.approx(100 * 2 / 6)
    assert m["R5"] == pytest.approx(100 * 3 / 6)
    assert m["R10"] == pytest.approx(100 * 4 / 6)
    assert m["R50"] == pytest.approx(100 * 5 / 6)
    assert m["MedR"] == pytest.approx(np.median(cols) + 1)
    assert m["MeanR"] == pytest.approx(np.mean(cols) + 1)
    gm = np.exp(np.mean(np.log([m["R1"], m["R5"], m["R10"]])))
    assert m["geometric_mean_R1-R5-R10"] == pytest.approx(gm)


def test_retrieval_as_classification_runs():
    rng = np.random.default_rng(3)
    sims = rng.standard_normal((6, 4))  # 6 labels x 4 videos
    masks = (rng.uniform(size=(6, 4)) > 0.5).astype(float)
    masks[0, :] = 1  # ensure every video has a label
    m = retrieval_as_classification(sims, masks)
    assert set(m) >= {"R1", "R5", "MedR"}


def test_map():
    sims = np.array([[1.0, 0.0], [0.0, 1.0]])
    masks = np.array([[1.0, 0.0], [0.0, 1.0]])
    m = mean_average_precision(sims, masks)
    assert m["mAP"] == pytest.approx(1.0)


def test_acc_and_topk():
    out = np.array([[0.1, 0.9], [0.8, 0.2], [0.3, 0.7]])
    tgt = np.array([1, 0, 0])
    assert acc(out, tgt) == pytest.approx(2 / 3)
    assert top_k_acc(out, tgt, k=2) == pytest.approx(1.0)


def _load_reference_metric_module():
    """Import the reference's actual metric.py as the oracle (ipdb stubbed)."""
    import importlib.util
    import os
    import sys
    import types

    path = "/root/reference/OATrans/model/metric.py"
    if not os.path.exists(path):
        return None
    if "ipdb" not in sys.modules:
        stub = types.ModuleType("ipdb")
        stub.set_trace = lambda: None
        sys.modules["ipdb"] = stub
    spec = importlib.util.spec_from_file_location("ref_metric", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_metrics_match_reference_module_exactly():
    """Run the reference's OWN metric.py (imported, not transcribed) and oatx's
    implementations on identical sims (with ties and query masks) — every
    scalar must agree."""
    import pytest as _pytest

    ref = _load_reference_metric_module()
    if ref is None:
        _pytest.skip("reference repo not available")
    rng = np.random.default_rng(17)
    # quantized sims force rank ties, exercising the tie-breaking branches
    sims = np.round(rng.standard_normal((40, 40)) * 2) / 4.0
    for fn_ref, fn_oatx in ((ref.t2v_metrics, t2v_metrics),
                            (ref.v2t_metrics, v2t_metrics)):
        want, got = fn_ref(sims), fn_oatx(sims)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-9), (fn_oatx.__name__, k)

    # grouped captions with query masks (videos with variable caption counts)
    n_vids, caps_per = 12, 3
    sims_g = np.round(rng.standard_normal((n_vids * caps_per, n_vids)) * 2) / 4.0
    masks = np.ones((n_vids, caps_per), dtype=int)
    masks[0, 2] = 0
    masks[5, 1:] = 0
    want = ref.t2v_metrics(sims_g, query_masks=masks)
    got = t2v_metrics(sims_g, query_masks=masks)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), ("t2v masked", k)
    want = ref.v2t_metrics(sims_g, query_masks=masks)
    got = v2t_metrics(sims_g, query_masks=masks)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), ("v2t masked", k)

    # classification-style ranking (multi-hot labels, averaged ties)
    sims_c = np.round(rng.standard_normal((9, 7)) * 2) / 4.0
    masks_c = (rng.uniform(size=(9, 7)) > 0.4).astype(float)
    masks_c[:, masks_c.sum(axis=0) == 0] = 1.0  # every video has >= 1 label
    want = ref.retrieval_as_classification(sims_c, query_masks=masks_c)
    got = retrieval_as_classification(sims_c, query_masks=masks_c)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), ("classification", k)
