"""Tracing/profiling utilities (green-field vs the reference, SURVEY.md §5: the
reference only prints wall-clock deltas — oatx adds jax.profiler trace capture,
relay-safe step timing, and a summary of the captured device timeline)."""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Dict, List, Optional


class StepTimer:
    """Rolling step timer. IMPORTANT on tunneled TPU runtimes: block_until_ready
    can return early — call mark() only after forcing the dependency chain (e.g.
    float(metrics['loss']))."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: List[float] = []
        self._last: Optional[float] = None

    def mark(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    @property
    def mean_step_s(self) -> Optional[float]:
        return sum(self._times) / len(self._times) if self._times else None

    def steps_per_sec(self) -> Optional[float]:
        m = self.mean_step_s
        return 1.0 / m if m else None


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard-compatible xplane + trace.json)."""
    import jax

    with jax.profiler.trace(str(log_dir)):
        yield


def summarize_trace(log_dir: str, top: int = 20) -> List[Dict]:
    """Summarize a captured trace's duration events (largest total first)."""
    import collections
    import glob
    import gzip

    files = sorted(glob.glob(str(Path(log_dir) / "plugins/profile/*/*.trace.json.gz")))
    if not files:
        return []
    with gzip.open(files[-1]) as f:
        events = json.load(f).get("traceEvents", [])
    durs: Dict[str, float] = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            durs[e.get("name", "?")] += e["dur"]
    return [{"name": n, "total_ms": d / 1e3}
            for n, d in sorted(durs.items(), key=lambda kv: -kv[1])[:top]]


def _device_op_events(log_dir: str) -> List[Dict]:
    """Leaf device-op events ('XLA Ops' threads of accelerator lanes) from the
    newest trace.json.gz under log_dir. Falls back to any device lane with an
    XLA-Ops thread (CPU traces) when no TPU lane exists."""
    import glob
    import gzip

    files = sorted(glob.glob(str(Path(log_dir) / "plugins/profile/*/*.trace.json.gz")))
    if not files:
        return []
    with gzip.open(files[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    pids = {e["pid"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in e.get("args", {}).get("name", "")}
    op_tids = {(e["pid"], e["tid"]) for e in events
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and (not pids or e.get("pid") in pids)
               and "XLA Ops" in e.get("args", {}).get("name", "")}
    return [e for e in events
            if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids]


def summarize_by_source(log_dir: str, steps: int = 1, top: int = 25,
                        data_movement_only: bool = False) -> List[Dict]:
    """Aggregate device-op time by the REPO source line that emitted the op
    (the `source` arg XLA attaches to each device event). This is how the
    round-3 '26% data movement' finding was turned into named offenders
    (PERF.md 'Per-source-line trace attribution') — use it to target layout
    work at real lines instead of op classes.

    data_movement_only=True keeps copy/reshape/slice/transpose/broadcast ops
    and 'data formatting'/'memory transfer' fusion categories."""
    import collections

    def _is_movement(e):
        name = e.get("name", "")
        cat = e.get("args", {}).get("hlo_category", "")
        return (cat in ("data formatting", "memory transfer")
                or name.startswith(("copy", "reshape", "slice.", "transpose",
                                    "broadcast")))

    by_src: Dict[str, float] = collections.Counter()
    count: Dict[str, int] = collections.Counter()
    for e in _device_op_events(log_dir):
        if data_movement_only and not _is_movement(e):
            continue
        src = e.get("args", {}).get("source", "?")
        by_src[src] += e.get("dur", 0)
        count[src] += 1
    return [{"source": s, "ms_per_step": us / 1e3 / max(1, steps),
             "ops_per_step": count[s] // max(1, steps)}
            for s, us in sorted(by_src.items(), key=lambda kv: -kv[1])[:top]]


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the device trace (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def memory_summary() -> Dict[str, float]:
    """Host RSS + per-device HBM usage in MB (reference utils/util.py
    memory_summary equivalent, device-aware)."""
    out: Dict[str, float] = {}
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    out["host_rss_mb"] = float(line.split()[1]) / 1024.0
    except OSError:
        pass
    try:
        import jax

        for d in jax.local_devices():
            stats = d.memory_stats() or {}
            if "bytes_in_use" in stats:
                out[f"{d.platform}{d.id}_hbm_mb"] = stats["bytes_in_use"] / 1e6
    except Exception:
        pass
    return out
