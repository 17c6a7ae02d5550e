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
