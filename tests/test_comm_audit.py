"""tools/comm_audit.py: HLO collective parsing + per-lane traffic attribution.

The pod-scaling story is auditable, not measured (no multi-chip hardware):
these tests pin the parser against both HLO replica_groups encodings
(explicit and iota), the ring byte formulas, and — on the same 8-device CPU
mesh the driver dryrun uses — that each parallelism lane's compiled train
step carries the traffic its design says it must (DP: gradient all-reduce on
'data' ~ 2x param bytes + batch-scaled embedding gather; TP: 'model'-axis
traffic; multi-slice: a 'dcn'-axis gradient reduce).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from tools import comm_audit as ca


def test_parse_groups_explicit_and_iota():
    line1 = "replica_groups={{0,1},{2,3},{4,5},{6,7}}, use_global_device_ids=true"
    g1 = ca._parse_groups(line1, 8)
    assert g1 == [[0, 1], [2, 3], [4, 5], [6, 7]]
    # iota v2: [2,4]<=[4,2]T(1,0) → transpose(arange(8).reshape(4,2))
    line2 = "replica_groups=[2,4]<=[4,2]T(1,0), use_global_device_ids=true"
    g2 = ca._parse_groups(line2, 8)
    assert g2 == [[0, 2, 4, 6], [1, 3, 5, 7]]
    line3 = "replica_groups=[1,8]<=[8], use_global_device_ids=true"
    assert ca._parse_groups(line3, 8) == [[0, 1, 2, 3, 4, 5, 6, 7]]


def test_shape_bytes_single_and_tuple():
    assert ca._shape_bytes("f32[16]{0}") == 64
    assert ca._shape_bytes("bf16[4,32]{1,0}") == 256
    # XLA's collective combiner emits variadic tuple-shaped all-reduces;
    # missing these drops nearly all DP gradient traffic (found the hard way)
    assert ca._shape_bytes("(f32[16]{0}, f32[16]{0}, bf16[8]{0})") == 144


def test_ring_byte_formulas():
    assert ca._per_chip_bytes("all-reduce", 8, 800) == pytest.approx(1400)
    assert ca._per_chip_bytes("all-gather", 8, 800) == pytest.approx(700)
    assert ca._per_chip_bytes("collective-permute", 2, 800) == 800
    assert ca._per_chip_bytes("all-reduce", 1, 800) == 0.0


def test_axis_classification_on_dcn_mesh():
    import jax

    from oatx.parallel import mesh as meshlib

    mesh = meshlib.make_mesh(8, model_parallel=2, dcn_slices=2,
                             devices=jax.devices()[:8])
    parts = ca._axis_partitions(mesh)
    assert set(parts) >= {"dcn", "data", "model", "dcn+data"}
    # model-axis groups are adjacent pairs in grid order
    model_groups = [sorted(g) for g in parts["model"]]
    assert [0, 1] in model_groups
    groups = [[int(d.id) for d in row.flat]
              for row in mesh.devices]  # one group per dcn row
    assert ca._classify_axis(
        [sorted(sum(groups[:1], [])), sorted(sum(groups[1:], []))],
        mesh, "all-reduce") in ("data+model", "dcn")  # sanity: classifiable


@pytest.fixture(scope="module")
def dp_audit():
    return ca.audit_lane("dp", 8, "tiny")


def test_dp_lane_gradient_reduce_and_negative_gather(dp_audit):
    import jax

    from oatx.models import towers

    a = dp_audit
    assert a["mesh"] == {"data": 8, "model": 1}
    # gradient all-reduce ≈ 2*(7/8) * param_bytes on the data axis
    cfg = ca._tower_cfg("tiny")
    params = towers.init(jax.random.PRNGKey(0), cfg)
    pbytes = sum(np.prod(l.shape) * 4 for l in jax.tree_util.tree_leaves(params))
    want = 2 * (7 / 8) * pbytes
    got = a["bytes_by_op"]["all-reduce"]
    # the gradient reduce must be present in full; softmax-stat / grad-norm /
    # gather-backward all-reduces legitimately ride on top (measured ~1.36x
    # at tiny geometry where the loss term is not negligible)
    assert want < got < 2.0 * want, (got, want)
    # the global-negative embedding all-gather is batch-scaled
    assert a["batch_scaled_bytes"] > 0
    assert set(a["bytes_by_axis"]) == {"data"}


def test_dp_projection_scales(dp_audit):
    p64 = ca.project(dp_audit, 64, ca.V5E_PEAK_BF16, 0.33,
                     ca.V5E_ICI_BW, ca.V5E_DCN_BW)
    p256 = ca.project(dp_audit, 256, ca.V5E_PEAK_BF16, 0.33,
                      ca.V5E_ICI_BW, ca.V5E_DCN_BW)
    # batch-scaled gather grows linearly; saturating all-reduce barely moves →
    # strictly more ICI bytes at 256 chips, step time monotone
    assert p256["ici_bytes_per_chip"] > p64["ici_bytes_per_chip"]
    assert p256["step_ms"] >= p64["step_ms"]


def test_tp_lane_has_model_axis_traffic():
    a = ca.audit_lane("tp2", 8, "tiny")
    assert a["mesh"] == {"data": 4, "model": 2}
    assert a["bytes_by_axis"].get("model", 0) > 0
    assert a["bytes_by_axis"].get("data", 0) > 0  # grads still reduce over data


def test_dcn_lane_reduces_gradients_across_slices():
    a = ca.audit_lane("dcn2+fsdp", 8, "tiny")
    assert a["mesh"] == {"dcn": 2, "data": 4, "model": 1}
    assert a["bytes_by_axis"].get("dcn", 0) > 0
    proj = ca.project(a, 256, ca.V5E_PEAK_BF16, 0.33,
                      ca.V5E_ICI_BW, ca.V5E_DCN_BW)
    assert proj["dcn_bytes_per_chip"] > 0
    # intra-slice fsdp traffic must dominate cross-slice dcn traffic (the
    # whole point of the multi-slice layout)
    assert a["bytes_by_axis"]["data"] > a["bytes_by_axis"]["dcn"]
