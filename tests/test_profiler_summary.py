"""summarize_by_source: parse a device trace into per-source-line totals.

A real TPU lane can't exist in the CPU test environment, so the parser is
exercised against a fabricated minimal trace.json.gz with the exact structure
XLA emits (process_name/thread_name metadata + X events carrying `source` and
`hlo_category` args); a real CPU capture must degrade to [] rather than crash.
"""

import gzip
import json

import jax
import jax.numpy as jnp

from oatx.utils import profiler


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def _fake_events():
    meta = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 7, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 3, "tid": 9, "name": "thread_name",
         "args": {"name": "XLA Modules"}},  # parent lane: must be excluded
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "python host"}},
    ]
    ops = [
        # 2 steps x one matmul fusion (repo source) + one copy (data movement)
        {"ph": "X", "pid": 3, "tid": 7, "ts": 0, "dur": 1000, "name": "fusion.1",
         "args": {"source": "oatx/ops/layers.py:22", "hlo_category": "fusion"}},
        {"ph": "X", "pid": 3, "tid": 7, "ts": 1000, "dur": 400, "name": "copy.5",
         "args": {"source": "oatx/ops/attention.py:149",
                  "hlo_category": "data formatting"}},
        {"ph": "X", "pid": 3, "tid": 7, "ts": 2000, "dur": 1000, "name": "fusion.1",
         "args": {"source": "oatx/ops/layers.py:22", "hlo_category": "fusion"}},
        {"ph": "X", "pid": 3, "tid": 7, "ts": 3000, "dur": 400, "name": "copy.5",
         "args": {"source": "oatx/ops/attention.py:149",
                  "hlo_category": "data formatting"}},
        # module-lane parent event: would double-count if included
        {"ph": "X", "pid": 3, "tid": 9, "ts": 0, "dur": 9999, "name": "jit_step",
         "args": {}},
    ]
    return meta + ops


def test_summarize_by_source_totals(tmp_path):
    log_dir = _write_trace(tmp_path, _fake_events())
    rows = profiler.summarize_by_source(log_dir, steps=2)
    assert rows[0] == {"source": "oatx/ops/layers.py:22", "ms_per_step": 1.0,
                       "ops_per_step": 1}
    assert rows[1]["source"] == "oatx/ops/attention.py:149"
    assert abs(rows[1]["ms_per_step"] - 0.4) < 1e-9
    # the XLA Modules parent event must not appear
    assert all(r["source"] != "?" for r in rows)


def test_summarize_by_source_movement_filter(tmp_path):
    log_dir = _write_trace(tmp_path, _fake_events())
    rows = profiler.summarize_by_source(log_dir, steps=2,
                                        data_movement_only=True)
    assert [r["source"] for r in rows] == ["oatx/ops/attention.py:149"]


def test_summarize_by_source_cpu_capture_degrades(tmp_path):
    """A real capture in this CPU test env has no XLA-Ops device lane —
    the summary must be empty, not an error."""
    f = jax.jit(lambda x: jnp.tanh(x @ x).sum())
    x = jnp.ones((64, 64))
    _ = float(f(x))
    with profiler.trace(str(tmp_path)):
        _ = float(f(x))
    assert profiler.summarize_by_source(str(tmp_path)) == []


def test_summarize_by_source_missing_dir(tmp_path):
    assert profiler.summarize_by_source(str(tmp_path / "nope")) == []
