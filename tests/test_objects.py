import numpy as np
import pytest

from oatx.data import objects as obj


@pytest.fixture
def npz_path(tmp_path, rng):
    n = 7
    feats = rng.standard_normal((n, 2048)).astype(np.float32)
    boxes = np.stack(
        [
            rng.uniform(0, 100, n),
            rng.uniform(0, 50, n),
            rng.uniform(100, 200, n),
            rng.uniform(50, 100, n),
        ],
        axis=1,
    ).astype(np.float32)
    info = {
        "objects_id": np.array([3, 1, 3, 7, 2, 1, 5]),
        "objects_conf": np.array([0.9, 0.1, 0.8, 0.7, 0.6, 0.5, 0.4], np.float32),
        "image_w": 200,
        "image_h": 100,
    }
    p = tmp_path / "0.npz"
    np.savez(p, x=feats, bbox=boxes, info=info)
    return str(p), feats, boxes, info


def test_read_object_features_shape_and_order(npz_path):
    path, feats, boxes, info = npz_path
    out = obj.read_object_features(path, top_k=3)
    assert out.shape == (3, 2054)
    # highest-confidence row first
    order = np.argsort(info["objects_conf"])[::-1]
    np.testing.assert_allclose(out[0, :2048], feats[order[0]], rtol=1e-6)
    # geometry columns normalized to [0,1]-ish
    geom = out[:, 2048:]
    assert geom.shape == (3, 6)
    assert np.all(geom[:, 0] <= 1.0) and np.all(geom[:, 1] <= 1.0)


def test_read_object_features_edge_pad(npz_path):
    path, feats, boxes, info = npz_path
    out = obj.read_object_features(path, top_k=12)
    assert out.shape == (12, 2054)
    # padded rows repeat the LAST REAL row (row 6 of 7): compare against it,
    # not padded-vs-padded (which any constant fill would also satisfy)
    np.testing.assert_allclose(out[7], out[6])
    np.testing.assert_allclose(out[11], out[6])


def test_read_object_features_missing_file(tmp_path):
    out = obj.read_object_features(str(tmp_path / "nope.npz"), top_k=5)
    assert out.shape == (5, 2054)
    assert np.all(out == 1.0)


def test_unique_classes_dedupes(npz_path):
    """unique_classes reproduces the reference QUIRK exactly: np.unique runs
    on the ORIGINAL-order ids but its indices select from the conf-SORTED
    rows (objects.py docstring; base_dataset.py:618-623)."""
    path, feats, boxes, info = npz_path
    out = obj.read_object_features(path, top_k=5, unique_classes=True)
    assert out.shape == (5, 2054)
    # recompute the quirk by hand and check the feature rows match
    order = np.argsort(info["objects_conf"])[::-1]
    sorted_feats = feats[order]
    _, uniq = np.unique(info["objects_id"], return_index=True)
    expect = sorted_feats[uniq]
    n = min(5, expect.shape[0])
    np.testing.assert_allclose(out[:n, :2048], expect[:n], rtol=1e-6)


def test_scaled_box_geometry_matches_reference_formula():
    boxes = np.array([[10.0, 20.0, 110.0, 70.0]])
    geom = obj.scaled_box_geometry(boxes, image_w=200, image_h=100)
    np.testing.assert_allclose(
        geom[0], [0.05, 0.2, 0.55, 0.7, 0.5, 0.5], rtol=1e-6
    )


def test_read_object_tags(npz_path, tmp_path):
    path, *_ = npz_path
    vocab = ["__background__"] + [f"class{i}" for i in range(10)]
    tags = obj.read_object_tags(path, vocab, top_k=3)
    # unique ids ascending: 1,2,3 → classes[2],classes[3],classes[4] = class1,class2,class3
    assert tags == " class1 class2 class3"


def test_read_object_labels(npz_path):
    path, *_ = npz_path
    labels = obj.read_object_labels(path, top_k=8)
    assert labels.shape == (8,)
    # unique ids ascending then edge-padded
    np.testing.assert_array_equal(labels[:5], [1, 2, 3, 5, 7])
    np.testing.assert_array_equal(labels[5:], [7, 7, 7])


def test_patch_masks_from_bboxes_matches_reference():
    # reference: rows [int(y1*14), ceil(y2*14)), cols [int(x1*14), ceil(x2*14))
    bboxes = np.array([[0.0, 0.0, 0.5, 0.5, 0.5, 0.5],
                       [0.5, 0.5, 1.0, 1.0, 0.5, 0.5]], dtype=np.float32)
    masks = obj.patch_masks_from_bboxes(bboxes, patch_rows=14)
    assert masks.shape == (2, 196)
    m0 = masks[0].reshape(14, 14)
    assert m0[:7, :7].all() and not m0[7:, :].any() and not m0[:, 7:].any()
    m1 = masks[1].reshape(14, 14)
    assert m1[7:, 7:].all() and not m1[:7, :].any()
    # input must not be mutated (reference mutates; we deliberately do not)
    assert bboxes[0, 2] == 0.5


def test_patch_masks_reference_golden():
    """Golden test against a literal transcription of the reference rasterizer."""
    import math

    def reference_impl(bboxs, patch_rows=14):
        bboxs = bboxs.copy()
        patch_masks = np.zeros((len(bboxs), patch_rows, patch_rows))
        bboxs[:, :4] = bboxs[:, :4] * patch_rows
        for index in range(len(bboxs)):
            bbox = bboxs[index]
            patch_masks[index, int(bbox[1]):math.ceil(bbox[3]), int(bbox[0]):math.ceil(bbox[2])] = 1
        return np.reshape(patch_masks, (len(bboxs), patch_rows * patch_rows))

    rng = np.random.default_rng(7)
    x1 = rng.uniform(0, 0.8, 20)
    y1 = rng.uniform(0, 0.8, 20)
    x2 = x1 + rng.uniform(0.05, 0.2, 20)
    y2 = y1 + rng.uniform(0.05, 0.2, 20)
    b = np.stack([x1, y1, x2, y2, x2 - x1, y2 - y1], axis=1)
    np.testing.assert_array_equal(
        obj.patch_masks_from_bboxes(b), reference_impl(b)
    )


def test_object_tag_token_spans():
    ends, total = obj.object_tag_token_spans([0, 2, 3, 1], [1, 2, 3])
    np.testing.assert_array_equal(ends, [2, 5, 6])
    assert total == 6


def test_pseudo_label_vector(npz_path):
    path, *_ = npz_path
    v = obj.pseudo_label_vector(path)
    assert v.shape == (1601,)
    assert v[1] == 1 and v[2] == 1 and v[3] == 1 and v[5] == 1 and v[7] == 1
    assert v.sum() == 5


def test_region_memory_bank(tmp_path, rng):
    emb = rng.standard_normal((1600, 512)).astype(np.float32)
    p = tmp_path / "bank.npy"
    np.save(p, emb)
    bank = obj.RegionMemoryBank.load(str(p))
    out = bank.lookup([0, 5, 1599, 2000])
    assert out.shape == (4, 512)
    np.testing.assert_allclose(out[1], emb[5])
    np.testing.assert_allclose(out[3], emb[1599])  # clipped
