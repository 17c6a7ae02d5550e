"""Worker program for the REAL 2-process jax.distributed tests
(tests/test_multiprocess_e2e.py). Run as:

    python tests/multiproc_worker.py step  <pid> <nproc> <port> <out.json>
    python tests/multiproc_worker.py dcn   <pid> <nproc> <port> <out.json>
    python tests/multiproc_worker.py cli   <pid> <nproc> <port> <out.json> <cfg>

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the parent); with
nproc=2 the global mesh is 8 devices across 2 OS processes with Gloo
collectives — the oatx equivalent of the reference's multi-process NCCL launch
(/root/reference/OATrans/train_dist_multi.py:35-38, train.md:17-27).
"""

import json
import os
import sys


def main():
    mode, pid, nproc, port, out_path = sys.argv[1:6]
    pid, nproc = int(pid), int(nproc)

    import jax

    jax.config.update("jax_platforms", "cpu")
    if mode == "cli":
        # the CLI owns distributed initialization (cli/train.py OATX_MULTIHOST)
        os.environ["OATX_MULTIHOST"] = "1"
        os.environ["OATX_COORDINATOR"] = f"localhost:{port}"
        os.environ["OATX_NUM_PROCESSES"] = str(nproc)
        os.environ["OATX_PROCESS_ID"] = str(pid)
    elif nproc > 1:
        jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                                   num_processes=nproc, process_id=pid)

    if mode == "step":
        result = run_step_mode()
    elif mode == "dcn":
        result = run_dcn_mode()
    elif mode == "cli":
        result = run_cli_mode(sys.argv[6])
    else:
        raise SystemExit(f"unknown mode {mode}")

    if pid == 0:
        with open(out_path, "w") as f:
            json.dump(result, f)
    # every process must reach the end together (collectives) — exit cleanly
    print(f"worker {pid}/{nproc} done", flush=True)


def run_step_mode():
    """Drive the actual training-step machinery (mesh/sharding/step builders —
    the exact objects Trainer uses) over the multi-process mesh and return the
    per-step losses. The parent compares 2-process vs 1-process bit-for-bit
    (same global batch, augment disabled so row placement is irrelevant)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from oatx.models import distilbert as dbert
    from oatx.models import towers
    from oatx.models import vit_spacetime as vst
    from oatx.parallel import mesh as meshlib
    from oatx.parallel import sharding as shardlib
    from oatx.train import step as steplib

    mesh = meshlib.make_mesh(8, model_parallel=2)
    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(img_size=32, patch_size=16, num_frames=2,
                                     embed_dim=64, depth=2, num_heads=4),
        text=dbert.DistilBertConfig(vocab_size=128, dim=64, hidden_dim=128,
                                    n_layers=2, n_heads=4,
                                    max_position_embeddings=32),
        projection_dim=32,
    )
    params = towers.init(jax.random.PRNGKey(0), cfg)
    params = shardlib.shard_params(mesh, params)
    optimizer = optax.adamw(1e-3)
    state = steplib.init_state(jax.random.PRNGKey(0), cfg, optimizer,
                               params=params)
    train_step = steplib.make_train_step(cfg, steplib.LossConfig(), optimizer,
                                         augment=None, donate=False)

    losses = []
    local = 8 // jax.process_count()
    r0 = jax.process_index() * local
    for t in range(3):
        rng = np.random.default_rng(100 + t)
        # GLOBAL deterministic batch; each process contributes its row range
        video = rng.standard_normal((8, 2, 32, 32, 3)).astype(np.float32)
        ids = rng.integers(1, 128, (8, 12)).astype(np.int32)
        maskv = np.ones((8, 12), np.int32)
        batch = {
            "video": meshlib.put_array(mesh, video[r0: r0 + local]),
            "input_ids": meshlib.put_array(mesh, ids[r0: r0 + local]),
            "attention_mask": meshlib.put_array(mesh, maskv[r0: r0 + local]),
        }
        state, metrics = train_step(state, batch)
        losses.append(float(metrics["loss"]))
    return {"losses": losses,
            "process_count": jax.process_count(),
            "n_devices": len(jax.devices())}


def run_dcn_mode():
    """Multi-slice pod lane ACROSS a real process boundary (VERDICT r4 #4):
    a ('dcn','data') mesh with dcn_slices=2 + fsdp param sharding, where with
    nproc=2 each dcn row (one would-be ICI slice) is exactly one OS process —
    the per-step gradient reduce on the dcn axis is a genuine cross-process
    (Gloo) collective, and the fsdp weight gathers stay intra-process, exactly
    the pod layout make_mesh documents. Same deterministic global batches as
    run_step_mode so the parent can compare against a single-process run."""
    import numpy as np
    import jax
    import optax

    from oatx.models import distilbert as dbert
    from oatx.models import towers
    from oatx.models import vit_spacetime as vst
    from oatx.parallel import mesh as meshlib
    from oatx.parallel import sharding as shardlib
    from oatx.train import step as steplib

    mesh = meshlib.make_mesh(8, model_parallel=1, dcn_slices=2)
    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(img_size=32, patch_size=16, num_frames=2,
                                     embed_dim=64, depth=2, num_heads=4),
        text=dbert.DistilBertConfig(vocab_size=128, dim=64, hidden_dim=128,
                                    n_layers=2, n_heads=4,
                                    max_position_embeddings=32),
        projection_dim=32,
    )
    params = towers.init(jax.random.PRNGKey(0), cfg)
    params = shardlib.shard_params_fsdp(mesh, params)
    optimizer = optax.adamw(1e-3)
    state = steplib.init_state(jax.random.PRNGKey(0), cfg, optimizer,
                               params=params)
    train_step = steplib.make_train_step(cfg, steplib.LossConfig(), optimizer,
                                         augment=None, donate=False, mesh=mesh)

    losses = []
    local = 8 // jax.process_count()
    r0 = jax.process_index() * local
    for t in range(3):
        rng = np.random.default_rng(100 + t)
        video = rng.standard_normal((8, 2, 32, 32, 3)).astype(np.float32)
        ids = rng.integers(1, 128, (8, 12)).astype(np.int32)
        maskv = np.ones((8, 12), np.int32)
        batch = {
            "video": meshlib.put_array(mesh, video[r0: r0 + local]),
            "input_ids": meshlib.put_array(mesh, ids[r0: r0 + local]),
            "attention_mask": meshlib.put_array(mesh, maskv[r0: r0 + local]),
        }
        state, metrics = train_step(state, batch)
        losses.append(float(metrics["loss"]))
    return {"losses": losses,
            "process_count": jax.process_count(),
            "n_devices": len(jax.devices()),
            "mesh_axes": dict(mesh.shape)}


def run_cli_mode(cfg_path):
    """Traverse cli/train.py's OATX_MULTIHOST path end-to-end, then report the
    per-epoch metrics from the tracker JSONL (written by process 0)."""
    import glob

    from oatx.cli import train as train_cli

    rc = train_cli.main(["-c", cfg_path, "-o"])
    assert rc == 0
    with open(cfg_path) as f:
        log_root = json.load(f)["trainer"]["save_dir"]
    events = sorted(glob.glob(os.path.join(log_root, "log", "**",
                                           "events.jsonl"), recursive=True))
    metrics = []
    for path in events:
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("kind") == "metrics":
                    metrics.append(rec)
    return {"rc": rc, "metrics": metrics, "n_events_files": len(events)}


if __name__ == "__main__":
    main()
