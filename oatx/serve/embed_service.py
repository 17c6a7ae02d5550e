"""Batched video/text → embedding serving path.

The BASELINE.json north star tracks "batched video→embedding serving p50 latency"
as a first-class metric. This module provides the production-shaped serving core:
fixed-batch compiled inference functions (one compile per bucket size), a
micro-batching queue that coalesces concurrent requests, and latency statistics
(p50/p90/p99) measured relay-safely (device fetch, not dispatch).
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class LatencyStats:
    samples_ms: List[float] = field(default_factory=list)
    max_samples: int = 100_000  # ring buffer: a long-running service must not
    _next: int = 0              # grow (or re-percentile) without bound

    def add(self, ms: float) -> None:
        if len(self.samples_ms) < self.max_samples:
            self.samples_ms.append(ms)
        else:
            self.samples_ms[self._next] = ms
            self._next = (self._next + 1) % self.max_samples

    def percentile(self, p: float) -> float:
        if not self.samples_ms:
            return float("nan")
        return float(np.percentile(self.samples_ms, p))

    def summary(self) -> Dict[str, Optional[float]]:
        # None (JSON null) when empty — json.dumps would otherwise emit bare
        # NaN, which strict JSON parsers reject
        if not self.samples_ms:
            return {"count": 0, "p50_ms": None, "p90_ms": None,
                    "p99_ms": None, "mean_ms": None}
        return {
            "count": len(self.samples_ms),
            "p50_ms": self.percentile(50),
            "p90_ms": self.percentile(90),
            "p99_ms": self.percentile(99),
            "mean_ms": float(np.mean(self.samples_ms)),
        }


class EmbedService:
    """Compiled dual-tower embedding service.

    Batch-size bucketing: requests are padded up to the nearest configured
    bucket so only len(buckets) graphs are ever compiled.
    """

    def __init__(self, params, tower_cfg, buckets: Sequence[int] = (1, 4, 16),
                 seq_len: int = 30, scan_chunk: int = 8,
                 quantize: Optional[str] = None,
                 quant_min_elems: int = 4096):
        import jax
        import jax.numpy as jnp

        from oatx.models import towers
        from oatx.train.step import make_augmenter, scan_chunked

        if quantize:  # weight-only int8: kernels live in HBM as int8 and are
            # dequantized inside the compiled graph (oatx.serve.quant)
            if quantize != "int8":
                raise ValueError(f"unknown quantize mode {quantize!r}")
            from oatx.serve.quant import dequantize_tree, quantize_tree

            # quant_min_elems mirrors save_artifact's knob so small/toy towers
            # can quantize too (quantize_tree refuses an empty kernel match)
            params = quantize_tree(params, min_elems=quant_min_elems)
            _dq = lambda p: dequantize_tree(p, jnp.float32)
        else:
            _dq = lambda p: p
        self.params = params
        self.cfg = tower_cfg
        self.buckets = sorted(buckets)
        self.seq_len = seq_len
        self.stats = {"video": LatencyStats(), "text": LatencyStats()}
        aug = make_augmenter(train=False, tower_cfg=tower_cfg)

        def video_body(p, video_u8):
            p = _dq(p)
            batch = aug(jax.random.PRNGKey(0), {"video": video_u8})
            return towers.compute_video(p, tower_cfg, batch["video"])["cls"]

        def video_fn(p, video_u8):
            # large buckets scan bs-`scan_chunk` sub-batches inside one jit —
            # the bucket-16 graph otherwise pays XLA's big-batch layout
            # transposes (PERF.md round 3: 320 vs 194 clips/s at bs=64). Only
            # divisible bucket sizes scan; others run unchunked.
            if scan_chunk and video_u8.shape[0] % scan_chunk == 0:
                return scan_chunked(
                    lambda v: video_body(p, v), scan_chunk)(video_u8)
            return video_body(p, video_u8)

        def text_fn(p, ids, mask):
            return towers.compute_text(_dq(p), tower_cfg, ids, mask)

        self._video_fn = jax.jit(video_fn)
        self._text_fn = jax.jit(text_fn)

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _chunks(self, n: int):
        """Bucket plan for n rows. Padding straight up to the covering bucket
        wastes compute when the gap is large — measured under sustained load:
        8 coalesced clips padded to bucket 16 halved qps (PERF.md round 3), so
        8 -> 4+4 (two 132 ms calls beat one 456 ms call). Plans are compared
        with a linear cost proxy cost(chunk) = F + bucket(chunk) rows, where
        the per-call fixed cost F is one smallest-bucket's worth of rows —
        this keeps degenerate all-unit plans (3 -> 1+1+1) from beating a
        single padded call."""
        b = self._bucket(n)
        if n == b or b == self.buckets[0]:
            return [n]
        plan, rem = [], n
        for size in reversed(self.buckets):
            while rem >= size:
                plan.append(size)
                rem -= size
        if rem:
            plan.append(rem)  # final partial chunk pads to its own bucket
        fixed = self.buckets[0]
        plan_cost = sum(fixed + self._bucket(c) for c in plan)
        if plan_cost < fixed + b:
            return plan
        return [n]

    def warmup(self, frames: int, canon: int = 256) -> None:
        """Compile every bucket ahead of serving."""
        for b in self.buckets:
            v = np.zeros((b, frames, canon, canon, 3), np.uint8)
            _ = np.asarray(self._video_fn(self.params, v))
            ids = np.zeros((b, self.seq_len), np.int32)
            _ = np.asarray(self._text_fn(self.params, ids, np.ones_like(ids)))

    def embed_video(self, video_u8: np.ndarray) -> np.ndarray:
        """(B, F, canon, canon, 3) uint8 → (B, D) float32; records latency.
        Oversize batches are processed in largest-bucket chunks, so only
        len(buckets) XLA graphs ever compile."""
        n = video_u8.shape[0]
        if n > self.buckets[-1]:
            step = self.buckets[-1]
            return np.concatenate([
                self.embed_video(video_u8[i: i + step])
                for i in range(0, n, step)])
        plan = self._chunks(n)
        if len(plan) > 1:
            outs, i = [], 0
            for size in plan:
                outs.append(self.embed_video(video_u8[i: i + size]))
                i += size
            return np.concatenate(outs)
        b = self._bucket(n)
        if n < b:
            pad = np.repeat(video_u8[-1:], b - n, axis=0)
            video_u8 = np.concatenate([video_u8, pad], axis=0)
        t0 = time.perf_counter()
        out = np.asarray(self._video_fn(self.params, video_u8))  # fetch = real latency
        self.stats["video"].add((time.perf_counter() - t0) * 1e3)
        return out[:n]

    def embed_text(self, input_ids: np.ndarray, attention_mask: np.ndarray) -> np.ndarray:
        n = input_ids.shape[0]
        if n > self.buckets[-1]:
            step = self.buckets[-1]
            return np.concatenate([
                self.embed_text(input_ids[i: i + step], attention_mask[i: i + step])
                for i in range(0, n, step)])
        b = self._bucket(n)
        if n < b:
            input_ids = np.concatenate(
                [input_ids, np.repeat(input_ids[-1:], b - n, axis=0)])
            attention_mask = np.concatenate(
                [attention_mask, np.repeat(attention_mask[-1:], b - n, axis=0)])
        t0 = time.perf_counter()
        out = np.asarray(self._text_fn(self.params, input_ids, attention_mask))
        self.stats["text"].add((time.perf_counter() - t0) * 1e3)
        return out[:n]

    def latency_summary(self) -> Dict[str, Dict[str, float]]:
        return {k: v.summary() for k, v in self.stats.items()}


class MicroBatcher:
    """Coalesces concurrent single requests into service batches (max_batch or
    max_wait_ms, whichever first). Thread-based; submit() blocks until the
    embedding is ready."""

    def __init__(self, service: EmbedService, max_batch: int = 16,
                 max_wait_ms: float = 5.0):
        self.service = service
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self._q: "queue.Queue[Tuple[np.ndarray, queue.Queue]]" = queue.Queue()
        self._stop = False
        self.batch_sizes: list = []  # realized coalesced sizes (observability)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, video_u8: np.ndarray) -> np.ndarray:
        """One clip (F, canon, canon, 3) → (D,) embedding."""
        done: "queue.Queue" = queue.Queue()
        self._q.put((video_u8, done))
        out = done.get()
        if isinstance(out, Exception):
            raise out
        return out

    def _loop(self) -> None:
        while not self._stop:
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            items = [first]
            deadline = time.perf_counter() + self.max_wait
            while len(items) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    items.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                # np.stack INSIDE the try: mismatched clip shapes must fail
                # the waiting requests, not kill the batcher thread (which
                # would deadlock every future submit)
                clips = np.stack([v for v, _ in items])
                self.batch_sizes.append(len(items))
                embeds = self.service.embed_video(clips)
                for (_, done), e in zip(items, embeds):
                    done.put(e)
            except Exception as ex:  # propagate to all waiters
                for _, done in items:
                    done.put(ex)

    def close(self) -> None:
        self._stop = True
        self._thread.join(timeout=1)
