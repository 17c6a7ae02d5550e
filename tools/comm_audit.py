"""Collective-traffic audit + pod-scaling projection (VERDICT r4 #7).

Multi-chip hardware is unavailable in this environment, so the pod-scaling
claim must be AUDITABLE instead of measured: this tool compiles the real
train step per parallelism lane on an n-device virtual CPU mesh (the same
lanes __graft_entry__.dryrun_multichip executes), parses every collective out
of the SPMD-partitioned HLO, attributes its per-chip bytes to the mesh axis
it rides (data / model / dcn), and projects a v5e-pod step time from the
measured compute cost and public bandwidth numbers.

    python tools/comm_audit.py                       # audit all lanes, tiny geom
    python tools/comm_audit.py --geometry vitb       # real ViT-B tensor geometry
    python tools/comm_audit.py --project 256 --json audit.json

Byte accounting (ring algorithms, per chip, group size g):
    all-reduce          2*(g-1)/g * tensor_bytes
    all-gather          (g-1)/g   * gathered_bytes
    reduce-scatter      (g-1)     * scattered_bytes
    collective-permute  tensor_bytes
    all-to-all          (g-1)/g   * tensor_bytes
Shapes in the partitioned module are per-device, so the printed operand of an
all-reduce is the per-chip shard and the result of an all-gather is the full
gathered tensor — exactly what the formulas above want.

Projection model (documented assumptions, all CLI-overridable):
  * compute time = per-chip optimal-cost-analysis FLOPs / (peak_flops * mfu);
    mfu defaults to the 0.327 measured on the dev chip (PERF.md round 4).
  * comm time = bytes_on_ici / ici_bw + bytes_on_dcn / dcn_bw, assuming
    compute/comm overlap NO better than the dev-relay measurement (none), so
    step_time = max(compute, ici) + dcn (dcn gradient reduce is not
    overlappable at the step boundary without pipelining it, which oatx does
    not claim).
  * scaling data→g: per-chip bytes of saturating collectives (all-reduce /
    all-gather of weights) scale by ((g-1)/g)/((g0-1)/g0); bytes of
    batch-proportional all-gathers (the global-negative embedding gather,
    recognizable by the batch dim in the gathered shape) scale by g/g0 when
    per-chip batch is held constant.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os as _os
import re
import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

# public v5e numbers (jax-ml.github.io/scaling-book: TPU v5e), overridable:
V5E_PEAK_BF16 = 197e12        # FLOP/s
V5E_ICI_BW = 4.5e10 * 2       # bytes/s per chip per direction x 2 axes usable
                              # for a 2D-torus ring on one mesh axis (the
                              # audit attributes each axis separately anyway)
V5E_DCN_BW = 3.125e9          # bytes/s per chip (25 Gbps/chip share of host NIC)

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}

# result is either one shape or a TUPLE of shapes — XLA's collective-combiner
# packs many gradient all-reduces into one variadic op: missing the tuple form
# silently drops nearly all DP gradient traffic
_COLL_RE = re.compile(
    r"= (?P<result>\([^)]*\)|\w+\[[\d,]*\](?:\{[\d,]*\})?)\s+"
    r"(?P<op>all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\(")
_SHAPE_RE = re.compile(r"(?P<dt>\w+)\[(?P<dims>[\d,]*)\]")
_GROUPS_LIT_RE = re.compile(r"replica_groups=\{(?P<body>\{[\d,{}]*\})\}")
_GROUPS_IOTA_RE = re.compile(
    r"replica_groups=\[(?P<ng>\d+),(?P<gs>\d+)\]<=\[(?P<dims>[\d,]+)\]"
    r"(?:T\((?P<perm>[\d,]+)\))?")
_SRC_TGT_RE = re.compile(r"source_target_pairs=\{(?P<body>[\d,{}]*)\}")


def _shape_bytes(shape_str: str) -> int:
    """Bytes of one shape or the sum over a tuple of shapes."""
    total = 0
    for m in _SHAPE_RE.finditer(shape_str):
        n = 1
        for d in filter(None, m.group("dims").split(",")):
            n *= int(d)
        total += n * _DTYPE_BYTES.get(m.group("dt"), 4)
    return total


def _shape_dims(shape_str: str) -> Tuple[int, ...]:
    dims: Tuple[int, ...] = ()
    for m in _SHAPE_RE.finditer(shape_str):
        dims += tuple(int(d) for d in filter(None, m.group("dims").split(",")))
    return dims


def _parse_groups(line: str, n_devices: int) -> Optional[List[List[int]]]:
    m = _GROUPS_LIT_RE.search(line)
    if m:
        return [[int(x) for x in g.split(",") if x]
                for g in re.findall(r"\{([\d,]*)\}", m.group("body"))]
    m = _GROUPS_IOTA_RE.search(line)
    if m:
        ng, gs = int(m.group("ng")), int(m.group("gs"))
        dims = [int(d) for d in m.group("dims").split(",")]
        arr = np.arange(int(np.prod(dims))).reshape(dims)
        if m.group("perm"):
            arr = arr.transpose([int(p) for p in m.group("perm").split(",")])
        return arr.reshape(ng, gs).tolist()
    m = _SRC_TGT_RE.search(line)  # collective-permute: pairs, not groups
    if m:
        pairs = re.findall(r"\{(\d+),(\d+)\}", line)
        return [[int(a), int(b)] for a, b in pairs]
    return None


def _axis_partitions(mesh) -> Dict[str, List[frozenset]]:
    """Expected device-id group partition for every non-empty combination of
    mesh axes (groups vary along those axes, fixed along the rest)."""
    import itertools

    ids = np.vectorize(lambda d: d.id)(mesh.devices)
    names = mesh.axis_names
    out = {}
    for r in range(1, len(names) + 1):
        for combo in itertools.combinations(range(len(names)), r):
            moved = np.moveaxis(ids, combo, range(len(combo)))
            flat = moved.reshape(int(np.prod([ids.shape[c] for c in combo])), -1)
            groups = [frozenset(flat[:, j]) for j in range(flat.shape[1])]
            key = "+".join(names[c] for c in combo)
            out[key] = groups
    return out


def _classify_axis(groups: List[List[int]], mesh, op: str) -> str:
    parts = _axis_partitions(mesh)
    if op == "collective-permute":
        # source_target_pairs: the axis whose groups cover every pair
        for key, part in parts.items():
            gsets = {frozenset(g) for g in part}
            if all(any(set(p) <= g for g in gsets) for p in groups):
                return key
        return "unknown"
    gset = {frozenset(g) for g in groups if len(g) > 1}
    if not gset:
        return "self"
    for key, part in parts.items():
        if gset == {g for g in part if len(g) > 1}:
            return key
    return "unknown"


@dataclasses.dataclass
class Collective:
    op: str
    axis: str
    group_size: int
    tensor_bytes: int
    per_chip_bytes: float
    batch_scaled: bool  # gathered shape carries the global batch dim


def _per_chip_bytes(op: str, g: int, tensor_bytes: int) -> float:
    if g <= 1:
        return 0.0
    if op == "all-reduce":
        return 2.0 * (g - 1) / g * tensor_bytes
    if op == "all-gather":
        return (g - 1) / g * tensor_bytes
    if op == "reduce-scatter":
        return float(g - 1) * tensor_bytes
    if op == "collective-permute":
        return float(tensor_bytes)
    if op == "all-to-all":
        return (g - 1) / g * tensor_bytes
    return 0.0


def audit_hlo(hlo_text: str, mesh, global_batch: int) -> List[Collective]:
    n = int(np.prod(list(mesh.shape.values())))
    out = []
    for line in hlo_text.splitlines():
        m = _COLL_RE.search(line)
        if not m:
            continue
        op = m.group("op")
        groups = _parse_groups(line, n)
        if groups is None:
            continue
        if op == "collective-permute":
            gsize = 2
        else:
            gsize = max((len(g) for g in groups), default=1)
        if gsize <= 1:
            continue
        tb = _shape_bytes(m.group("result"))
        axis = _classify_axis(groups, mesh, op)
        dims = _shape_dims(m.group("result"))
        out.append(Collective(
            op=op, axis=axis, group_size=gsize, tensor_bytes=tb,
            per_chip_bytes=_per_chip_bytes(op, gsize, tb),
            batch_scaled=op == "all-gather" and global_batch in dims))
    return out


# --------------------------------------------------------------------- lanes

def _tower_cfg(geometry: str, variant: str = "baseline", depth: int = 0,
               split_stream: Optional[bool] = None, **over):
    import dataclasses as dc

    from oatx.models import distilbert as dbert, towers, vit_spacetime as vst

    if geometry == "vitb":
        cfg = towers.TowerConfig(
            video=vst.SpaceTimeViTConfig(img_size=224, patch_size=16,
                                         embed_dim=768, depth=depth or 2,
                                         num_heads=12,
                                         num_frames=4, time_init="zeros"),
            text=dbert.DistilBertConfig(n_layers=2),
            projection_dim=256, variant=variant)
    else:
        cfg = towers.TowerConfig(
            video=vst.SpaceTimeViTConfig(img_size=32, patch_size=16,
                                         embed_dim=64, depth=2, num_heads=4,
                                         num_frames=2, time_init="zeros"),
            text=dbert.DistilBertConfig(vocab_size=128,
                                        max_position_embeddings=32, dim=64,
                                        hidden_dim=128, n_layers=2, n_heads=4),
            projection_dim=16, variant=variant)
    if split_stream is not None:
        over = {**over, "split_cls_stream": split_stream}
    if over:
        cfg = dc.replace(cfg, video=dc.replace(cfg.video, **over))
    return cfg


LANES = ("dp", "dp_manual", "dp_manual_bf16", "fsdp", "tp2", "sp", "pp2",
         "dcn2+fsdp", "dcn2_manual")


def build_lane(label: str, n_devices: int, geometry: str, depth: int = 0,
               split_stream: Optional[bool] = None):
    """(mesh, train_step, state, batch, global_batch) for one lane — the same
    layouts dryrun_multichip runs (__graft_entry__._dryrun_impl), built here
    for LOWERING (the audit compiles but never executes the step)."""
    import jax

    from oatx.parallel import mesh as meshlib, sharding
    from oatx.train import optim, step as steplib

    from oatx.models import towers

    model_parallel = 2 if label in ("tp2", "sp", "pp2") else 1
    dcn = 2 if label.startswith("dcn2") else 1
    manual = "_manual" in label  # trainer.dp_mode='manual' equivalent:
    # per-shard backward under shard_map + ONE explicit pmean per grad leaf
    # (step._manual_dp_grads) — the default for eligible pure-DP meshes
    grad_dtype = None
    if label.endswith("_bf16"):  # trainer.grad_reduce_dtype='bf16': cast the
        # gradient for the cross-chip reduce only (halves DP grad bandwidth)
        import jax.numpy as _jnp

        grad_dtype = _jnp.bfloat16
    over = {}
    if label == "sp":
        over = {"sequence_parallel": True}
    if label == "pp2":
        over = {"pipeline_stages": 2, "pipeline_microbatches": 2}
    cfg = _tower_cfg(geometry, depth=depth, split_stream=split_stream, **over)
    devs = jax.devices()[:n_devices]
    mesh = meshlib.make_mesh(n_devices, model_parallel=model_parallel,
                             dcn_slices=dcn, devices=devs)
    b = 2 * meshlib.batch_shards(mesh)
    optimizer = optim.make_optimizer(lr=1e-4)
    init_params = towers.init(jax.random.PRNGKey(0), cfg)
    if "fsdp" in label:
        params = sharding.shard_params_fsdp(mesh, init_params, min_size=1024)
    elif label == "pp2":
        params = sharding.shard_params_pipeline(mesh, init_params)
    else:
        params = sharding.shard_params(mesh, init_params)
    state = steplib.init_state(jax.random.PRNGKey(1), cfg, optimizer,
                               params=params)
    train_step = steplib.make_train_step(
        cfg, steplib.LossConfig(), optimizer, donate=False,
        mesh=mesh if manual else None,
        manual_axes=meshlib.batch_axes(mesh) if manual else None,
        grad_reduce_dtype=grad_dtype)
    rng = np.random.default_rng(0)
    img, f = (224, 4) if geometry == "vitb" else (32, 2)
    vocab = 30522 if geometry == "vitb" else 128
    batch = {
        "video": np.asarray(rng.standard_normal((b, f, img, img, 3)),
                            np.float32),
        "input_ids": rng.integers(0, vocab, (b, 12)),
        "attention_mask": np.ones((b, 12), np.int32),
    }
    batch = meshlib.shard_batch(mesh, batch)
    return mesh, train_step, state, batch, b


def audit_lane(label: str, n_devices: int, geometry: str,
               depth: int = 0,
               split_stream: Optional[bool] = None) -> Dict:
    import jax

    mesh, train_step, state, batch, b = build_lane(label, n_devices, geometry,
                                                   depth=depth,
                                                   split_stream=split_stream)
    compiled = jax.jit(train_step).lower(state, batch).compile()
    hlo = compiled.as_text()
    colls = audit_hlo(hlo, mesh, global_batch=b)
    # collectives inside a while body (lax.scan over blocks / pipelines with
    # loop bodies) execute per iteration but appear ONCE in the text — the
    # audited configs unroll (scan_blocks=False), so this should stay 0; a
    # nonzero count means the byte totals below are an UNDERCOUNT
    n_while = len(re.findall(r"= \S+ while\(", hlo))
    cost = compiled.cost_analysis() or {}
    by_axis: Dict[str, float] = {}
    for c in colls:
        by_axis[c.axis] = by_axis.get(c.axis, 0.0) + c.per_chip_bytes
    return {
        "lane": label,
        "mesh": dict(mesh.shape),
        "global_batch": b,
        "n_collectives": len(colls),
        "while_loops": n_while,
        "flops_per_chip": float(cost.get("flops", 0.0)),
        "bytes_by_axis": {k: round(v) for k, v in sorted(by_axis.items())},
        "bytes_by_op": _rollup(colls, "op"),
        "batch_scaled_bytes": round(sum(
            c.per_chip_bytes for c in colls if c.batch_scaled)),
        "collectives": [dataclasses.asdict(c) for c in colls],
    }


def _rollup(colls: List[Collective], key: str) -> Dict[str, int]:
    out: Dict[str, float] = {}
    for c in colls:
        k = getattr(c, key)
        out[k] = out.get(k, 0.0) + c.per_chip_bytes
    return {k: round(v) for k, v in sorted(out.items())}


# ---------------------------------------------------------------- projection

def project(audit: Dict, target_chips: int, peak_flops: float, mfu: float,
            ici_bw: float, dcn_bw: float) -> Dict:
    """Scale one 8-device lane audit to a target chip count (per-chip batch
    held constant) and predict the step time. Saturating collectives scale by
    the ring factor ratio; batch-proportional gathers scale linearly."""
    g0 = int(np.prod(list(audit["mesh"].values())))
    dcn0 = audit["mesh"].get("dcn", 1)
    # target decomposition: keep the model axis, scale data (and dcn) out
    scale = target_chips / g0
    ici_bytes = dcn_bytes = 0.0
    for c in audit["collectives"]:
        g, b0 = c["group_size"], c["per_chip_bytes"]
        grew = g * scale if c["axis"] in ("data", "dcn", "dcn+data") else g
        ring0, ring1 = (g - 1) / g, (grew - 1) / grew
        scaled = b0 * (scale if c["batch_scaled"] else ring1 / max(ring0, 1e-9))
        if "dcn" in c["axis"]:
            dcn_bytes += scaled
        else:
            ici_bytes += scaled
    compute_s = audit["flops_per_chip"] / (peak_flops * mfu)
    ici_s = ici_bytes / ici_bw
    dcn_s = dcn_bytes / dcn_bw
    step_s = max(compute_s, ici_s) + dcn_s
    return {
        "target_chips": target_chips,
        "dcn_slices_scaled": dcn0 * (scale if dcn0 > 1 else 1),
        "ici_bytes_per_chip": round(ici_bytes),
        "dcn_bytes_per_chip": round(dcn_bytes),
        "compute_ms": round(compute_s * 1e3, 3),
        "ici_ms": round(ici_s * 1e3, 3),
        "dcn_ms": round(dcn_s * 1e3, 3),
        "step_ms": round(step_s * 1e3, 3),
        "comm_fraction": round((ici_s + dcn_s) / max(step_s, 1e-12), 4),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--geometry", default="tiny", choices=["tiny", "vitb"])
    p.add_argument("--depth", type=int, default=0,
                   help="override vitb tower depth (default 2, the dryrun "
                        "trim; 12 = real ViT-B, slower compile)")
    p.add_argument("--lanes", default=",".join(LANES))
    p.add_argument("--split-stream", default=None, choices=["on", "off"],
                   help="override video split_cls_stream (default: library "
                        "default, currently ON). Pod recipes run OFF — split "
                        "doubles the video-grad reduce under DP (PERF.md r5)")
    p.add_argument("--project", type=int, default=256,
                   help="target pod chip count for the projection (0: skip)")
    p.add_argument("--peak-flops", type=float, default=V5E_PEAK_BF16)
    p.add_argument("--mfu", type=float, default=0.327,
                   help="measured dev-chip MFU (PERF.md round 4)")
    p.add_argument("--ici-bw", type=float, default=V5E_ICI_BW)
    p.add_argument("--dcn-bw", type=float, default=V5E_DCN_BW)
    p.add_argument("--json", default=None, help="write full results here")
    p.add_argument("--terse", action="store_true",
                   help="omit per-collective detail from stdout")
    args = p.parse_args(argv)

    import os

    import jax

    if os.environ.get("OATX_PLATFORM"):
        # env vars alone cannot force CPU here (the axon sitecustomize imports
        # jax first — CLAUDE.md); honor the in-code pin like oatx/__init__
        jax.config.update("jax_platforms", os.environ["OATX_PLATFORM"])

    if jax.default_backend() != "cpu" or len(jax.devices()) < args.devices:
        print("comm_audit must run on a virtual CPU mesh, e.g.\n"
              "  OATX_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_"
              f"device_count={args.devices} python tools/comm_audit.py",
              file=sys.stderr)
        return 2

    results = []
    for lane in args.lanes.split(","):
        a = audit_lane(lane.strip(), args.devices, args.geometry,
                       depth=args.depth,
                       split_stream={"on": True, "off": False,
                                     None: None}[args.split_stream])
        if args.project:
            a["projection"] = project(a, args.project, args.peak_flops,
                                      args.mfu, args.ici_bw, args.dcn_bw)
        results.append(a)
        show = {k: v for k, v in a.items() if k != "collectives"}
        print(json.dumps(show if args.terse else a))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"geometry": args.geometry, "devices": args.devices,
                       "assumptions": {
                           "peak_flops": args.peak_flops, "mfu": args.mfu,
                           "ici_bw": args.ici_bw, "dcn_bw": args.dcn_bw},
                       "lanes": results}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
