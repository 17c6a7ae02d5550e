"""Sustained-training soak on the real chip (VERDICT r4 #5).

Runs the flagship ViT-B pretrain step through the REAL CLI (oatx.cli.train:
fixture corpus → native decode → prefetch → jitted step → async Orbax
checkpoints + EMA + one in-run profile window) unattended for --minutes,
SIGTERMs the process mid-run to force a preemption snapshot, resumes from it,
and reports:

  * per-epoch wall time / loss / input_wait trajectory (drift check),
  * per-log-line step-time distribution p50/p99 (each trainer log line fences
    a loss fetch every ~sqrt(bs) cycles — honest sync points),
  * host RSS samples every 10 s (leak check),
  * HBM high-water (device memory_stats when the backend exposes it),
  * loss continuity across the SIGTERM→resume boundary.

    python tools/exp_soak.py --minutes 30 --kill-after 12 [--clips 128]

Writes a JSON summary to --out (default /tmp/oatx_soak.json). Relay-weather
hazard: the run is resumable by construction; if the relay stalls, re-run
with --resume <preempt-dir>.
"""

from __future__ import annotations

import argparse
import json
import os as _os
import re
import signal
import subprocess
import sys
import tempfile
import threading
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def soak_config(root: str, clips: int, len_epoch: int) -> dict:
    return {
        "name": "soak",
        "tokenizer": {"vocab_size": 2048},
        "arch": {
            "type": "FrozenInTime", "variant": "baseline",
            "args": {
                "video_params": {
                    "model": "SpaceTimeTransformer", "arch_config": "base_patch16_224",
                    "num_frames": 4, "input_res": 224, "embed_dim": 768,
                    "depth": 12, "num_heads": 12, "time_init": "zeros",
                    "pretrained": False,
                },
                "object_params": {"model": ""},
                "text_params": {"model": "distilbert-base-uncased",
                                "pretrained": False, "vocab_size": 2048},
                "projection": "minimal", "projection_dim": 256,
                "load_checkpoint": "",
            },
        },
        "data_loader": [{
            "type": "TextVideoDataLoader",
            "args": {
                "dataset_name": "SyntheticVideoText",
                "data_dir": root + "/videos", "object_dir": "",
                "batch_size": 8, "num_workers": 2, "split": "train",
                "video_params": {"input_res": 224, "num_frames": 4,
                                 "num_videos": clips, "fixture_seeded": True,
                                 "fixture_width": 320, "fixture_height": 240,
                                 "fixture_frames": 48, "loading": "lax"},
            },
        }],
        "optimizer": {"type": "AdamW",
                      "args": {"lr": 1e-4, "schedule": "cosine",
                               "warmup_steps": 200}},
        "loss": {"type": "NormSoftmaxLoss", "args": {}},
        "metrics": [],
        "trainer": {
            "epochs": 10 ** 4, "len_epoch": len_epoch,
            "max_samples_per_epoch": 10 ** 9,
            "save_dir": root + "/exps", "save_period": 5,
            "async_checkpoint": True, "ema_decay": 0.999,
            "profile_epoch": 3, "profile_start_step": 10, "profile_steps": 4,
            "verbosity": 2, "monitor": "off", "early_stop": 10 ** 9,
            "init_val": False, "precision": "bf16", "seed": 0,
        },
        "visualizer": {"type": ""},
    }


LOG_LINE = re.compile(
    r"Train Epoch: (\d+) (\d+)/(\d+) Loss\[0\]: ([\d.eE+-]+) \(([\d.]+)s\)")


def parse_log(text: str):
    """→ (per-line records, per-epoch summaries) from the trainer stdout."""
    lines = []
    for m in LOG_LINE.finditer(text):
        lines.append({"epoch": int(m.group(1)), "cycle": int(m.group(2)),
                      "of": int(m.group(3)), "loss": float(m.group(4)),
                      "chunk_s": float(m.group(5))})
    # per-epoch summary lines: "<log prefix>:    <key padded to 24>: <value>"
    epochs: dict = {}
    for m in re.finditer(
            r"(epoch|loss_0|input_wait|epoch_time)\s{2,}:\s*([-\d.eE+]+)\s*$",
            text, re.M):
        k, v = m.group(1), float(m.group(2))
        if k == "epoch":
            epochs[int(v)] = {"epoch": int(v)}
        elif epochs:
            epochs[max(epochs)][k] = v
    return lines, [epochs[k] for k in sorted(epochs)]


def rss_mb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for ln in f:
                if ln.startswith("VmRSS:"):
                    return int(ln.split()[1]) / 1024.0
    except OSError:
        pass
    return float("nan")


def launch(cfg_path: str, resume: str | None, log_path: str) -> subprocess.Popen:
    args = [sys.executable, "-m", "oatx.cli.train"]
    args += ["-r", resume] if resume else ["-c", cfg_path, "--no_timestamp"]
    logf = open(log_path, "a")
    return subprocess.Popen(args, stdout=logf, stderr=subprocess.STDOUT,
                            cwd="/root/repo")


def percentiles(xs, ps=(50, 99)):
    import numpy as np

    xs = sorted(xs)
    return {f"p{p}": round(float(np.percentile(xs, p)), 3) for p in ps} \
        if xs else {}


def probe_relay(timeout_s: float = 300.0) -> bool:
    """CLAUDE.md discipline: the relay can stall for hours — a bounded
    scalar fetch in a THROWAWAY subprocess (so a stall doesn't wedge us).
    300 s: jax import is ~10 s and a healthy first fetch 30-150 s depending
    on relay weather (measured both ends of that range minutes apart); a
    true stall hangs for hours, so five minutes separates them."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))"],
            timeout=timeout_s, capture_output=True, cwd="/root/repo")
        return r.returncode == 0 and b"64.0" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def wait_first_step(log_path: str, proc: subprocess.Popen,
                    timeout_s: float) -> bool:
    """Block until the trainer emits its first step log line (fixture gen +
    first relay compile can take many minutes on a contended host — the
    preemption drill must not fire before training exists to preempt)."""
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if proc.poll() is not None:
            return False
        try:
            with open(log_path) as f:
                if LOG_LINE.search(f.read()):
                    return True
        except OSError:
            pass
        time.sleep(5)
    return False


def terminate(proc: subprocess.Popen, grace_s: float = 300.0) -> int:
    """SIGTERM → wait → SIGKILL escalation (a relay-stalled step blocks the
    main thread in a device fetch, so SIGTERM may never be serviced)."""
    proc.send_signal(signal.SIGTERM)
    try:
        return proc.wait(timeout=grace_s)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait(timeout=60)
        return -9


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--minutes", type=float, default=30.0,
                   help="training-time budget, counted from the FIRST step")
    p.add_argument("--kill-after", type=float, default=12.0,
                   help="minutes of TRAINING until SIGTERM (preemption drill)")
    p.add_argument("--startup-timeout", type=float, default=20.0,
                   help="minutes to wait for the first step line before "
                        "declaring a relay stall")
    p.add_argument("--clips", type=int, default=128)
    p.add_argument("--len-epoch", type=int, default=100)
    p.add_argument("--out", default="/tmp/oatx_soak.json")
    p.add_argument("--resume", default=None,
                   help="resume a previous soak from this snapshot dir")
    args = p.parse_args(argv)

    if not probe_relay():
        print("relay probe FAILED (bounded scalar fetch) — not starting; retry later")
        return 3

    root = tempfile.mkdtemp(prefix="oatx_soak_")
    cfg = soak_config(root, args.clips, args.len_epoch)
    cfg_path = _os.path.join(root, "soak.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    log_path = _os.path.join(root, "train.log")
    print(json.dumps({"soak_root": root, "log": log_path}), flush=True)

    rss = []
    stop_rss = threading.Event()

    def sample_rss(proc_holder):
        while not stop_rss.is_set():
            pr = proc_holder[0]
            if pr is not None and pr.poll() is None:
                rss.append({"t": round(time.time() - t_start, 1),
                            "rss_mb": round(rss_mb(pr.pid), 1)})
            stop_rss.wait(10.0)

    t_start = time.time()
    holder = [None]
    threading.Thread(target=sample_rss, args=(holder,), daemon=True).start()

    # phase 1: train until the kill point (timed from the FIRST step — fixture
    # generation and the first relay compile are startup, not training)
    proc = launch(cfg_path, args.resume, log_path)
    holder[0] = proc
    if not wait_first_step(log_path, proc, args.startup_timeout * 60):
        stop_rss.set()
        if proc.poll() is None:
            terminate(proc, grace_s=30)
            print("NO first step within startup-timeout — relay stall? "
                  "soak aborted (safe to re-run)")
        else:
            print("train process exited during startup rc=", proc.returncode)
        return 1
    t_train0 = time.time()
    print(json.dumps({"event": "first_step",
                      "startup_s": round(t_train0 - t_start, 1)}), flush=True)
    deadline_kill = t_train0 + args.kill_after * 60
    while time.time() < deadline_kill:
        if proc.poll() is not None:
            print("train process exited early rc=", proc.returncode)
            stop_rss.set()
            return 1
        time.sleep(5)
    print(json.dumps({"event": "SIGTERM", "t_min": round((time.time() - t_start) / 60, 1)}),
          flush=True)
    rc = terminate(proc)
    save_dir = _os.path.join(root, "exps", "models", "soak")
    preempts = sorted(
        d for d in _os.listdir(save_dir)
        if d.startswith("preempt-")
        and _os.path.isdir(_os.path.join(save_dir, d))  # skip .meta.json sidecars
    ) if _os.path.isdir(save_dir) else []
    print(json.dumps({"event": "preempt_exit", "rc": rc,
                      "snapshots": preempts}), flush=True)
    if not preempts:
        stop_rss.set()
        print("NO preemption snapshot written — soak FAILED")
        return 1

    # phase 2: resume from the preemption snapshot until the time budget ends
    resume_dir = _os.path.join(save_dir, preempts[-1])
    proc = launch(cfg_path, resume_dir, log_path)
    holder[0] = proc
    deadline = t_train0 + args.minutes * 60
    while time.time() < deadline:
        if proc.poll() is not None:
            print("resumed process exited rc=", proc.returncode)
            break
        time.sleep(5)
    if proc.poll() is None:
        terminate(proc)
    stop_rss.set()

    with open(log_path) as f:
        text = f.read()
    lines, epochs = parse_log(text)
    kill_epoch = max((l["epoch"] for l in lines), default=0)
    chunk_times = [l["chunk_s"] for l in lines if l["cycle"] > 6]
    # loss continuity: mean of the last 3 pre-kill chunks vs first 3 resumed
    resumed = [l for l in lines if l["epoch"] >= kill_epoch]
    summary = {
        "minutes": round((time.time() - t_start) / 60, 1),
        "epochs_completed": len(epochs),
        "epoch_time": percentiles([e.get("epoch_time", float("nan"))
                                   for e in epochs if "epoch_time" in e]),
        "chunk_time_s": percentiles(chunk_times),
        "first_vs_last_epoch_time": (
            [round(epochs[i].get("epoch_time", float("nan")), 1)
             for i in (0, -1)] if epochs else None),
        "input_wait": percentiles([e["input_wait"] for e in epochs
                                   if "input_wait" in e]),
        "loss_trajectory": [round(e["loss_0"], 4) for e in epochs
                            if "loss_0" in e],
        "rss_mb_first_last": ([rss[0], rss[-1]] if rss else None),
        "rss_samples": len(rss),
        "preempt_snapshot": preempts[-1],
        "resume_log_lines": len(resumed),
    }
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "epochs": epochs, "rss": rss,
                   "lines": lines[-200:]}, f, indent=1)
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
