"""AOT serving artifacts (jax.export / StableHLO).

Packages the compiled dual-tower embedding functions into a self-contained
artifact directory so a production server can run inference WITHOUT the oatx
model code — only jax + this loader. The export is shape-polymorphic over the
batch dimension (one artifact serves any batch size, no bucket recompiles)
and, where the installed jax supports cross-platform lowering, carries both
CPU and TPU lowerings so the artifact built on a CPU-only host runs on the
serving TPU unchanged.

The reference has no deployment story at all (its eval scripts rank offline —
SURVEY.md §2); this closes the model-packaging half of oatx serving: train →
`tools/export_serving.py` → ship the directory → `ExportedEmbedder(dir)`.

Artifact layout (a directory):
  video.stablehlo   jax.export-serialized (params, uint8 video) → (B, D) cls
  text.stablehlo    jax.export-serialized (params, ids, mask)   → (B, D)
  params.npz        flattened param leaves, '/'-joined tree paths as keys
  meta.json         canon/frames/seq_len, platforms, dtype notes
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


_SEP = "/"


def _flatten_params(params) -> Dict[str, np.ndarray]:
    import jax

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = _SEP.join(
            jax.tree_util.keystr((k,)).strip("[].'\"") for k in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_params(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, leaf in flat.items():
        node = tree
        parts = key.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree


def _export_platforms():
    """('cpu', 'tpu') when this jax can cross-lower, else the default."""
    import jax

    return ("cpu", "tpu")


def export_embed_fns(params, tower_cfg, *, frames: int, canon: int = 256,
                     seq_len: int = 30,
                     platforms: Optional[Sequence[str]] = None,
                     quantized: bool = False):
    """Export the two serving functions, batch-dim symbolic.

    video: (b, frames, canon, canon, 3) uint8 → (b, D) float — includes the
    device-side eval transform (resize/crop/normalize), i.e. the exact
    EmbedService.video body (embed_service.py) minus the bucket machinery the
    symbolic batch makes unnecessary.
    text:  (b, seq_len) ids + mask → (b, D).

    quantized=True: `params` is an oatx.serve.quant int8 tree; the exported
    graphs carry the dequantize so the ARTIFACT (and serving HBM) hold int8
    kernels.
    """
    import jax
    from jax import export as jexport

    from oatx.models import towers
    from oatx.train.step import make_augmenter

    aug = make_augmenter(train=False, tower_cfg=tower_cfg)
    if quantized:
        from oatx.serve.quant import dequantize_tree

        _dq = lambda p: dequantize_tree(p, jax.numpy.float32)
    else:
        _dq = lambda p: p

    def video_fn(p, video_u8):
        batch = aug(jax.random.PRNGKey(0), {"video": video_u8})
        return towers.compute_video(_dq(p), tower_cfg, batch["video"])["cls"]

    def text_fn(p, input_ids, attention_mask):
        return towers.compute_text(_dq(p), tower_cfg, input_ids, attention_mask)

    (b,) = jexport.symbolic_shape("b")
    pspec = jax.tree_util.tree_map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype), params)
    vspec = jax.ShapeDtypeStruct((b, frames, canon, canon, 3), jax.numpy.uint8)
    ispec = jax.ShapeDtypeStruct((b, seq_len), jax.numpy.int32)

    def _export(fn, *specs):
        plats = tuple(platforms) if platforms else _export_platforms()
        try:
            return jexport.export(jax.jit(fn), platforms=plats)(*specs)
        except Exception:
            if platforms:  # explicit request must not silently degrade
                raise
            # cross-lowering unavailable in this jax build: native platform
            return jexport.export(jax.jit(fn))(*specs)

    return {"video": _export(video_fn, pspec, vspec),
            "text": _export(text_fn, pspec, ispec, ispec)}


def save_artifact(out_dir, params, tower_cfg, *, frames: int,
                  canon: int = 256, seq_len: int = 30,
                  platforms: Optional[Sequence[str]] = None,
                  quantize: Optional[str] = None,
                  quant_min_elems: int = 4096) -> Path:
    """Export + write the artifact directory; returns its path.

    quantize="int8": weight-only per-channel int8 kernels (oatx.serve.quant)
    — ~4x smaller params.npz and ~4x less weight HBM traffic per request; the
    dequantize is baked into the exported graphs so loading is unchanged.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    quant_report = None
    if quantize:
        if quantize != "int8":
            raise ValueError(f"unknown quantize mode {quantize!r}")
        from oatx.serve.quant import quantization_report, quantize_tree

        qparams = quantize_tree(params, min_elems=quant_min_elems)
        quant_report = quantization_report(params, qparams)
        params = qparams
    exported = export_embed_fns(params, tower_cfg, frames=frames, canon=canon,
                                seq_len=seq_len, platforms=platforms,
                                quantized=bool(quantize))
    (out / "video.stablehlo").write_bytes(exported["video"].serialize())
    (out / "text.stablehlo").write_bytes(exported["text"].serialize())
    flat = _flatten_params(params)
    # npz has no bfloat16: store raw bytes + dtype strings for non-numpy dtypes
    dtypes = {}
    store = {}
    for k, v in flat.items():
        if v.dtype.kind == "V" or str(v.dtype) == "bfloat16":
            dtypes[k] = [str(v.dtype), list(v.shape)]
            store[k] = np.frombuffer(v.tobytes(), np.uint8)
        else:
            store[k] = v
    np.savez(out / "params.npz", **store)
    meta = {
        "frames": frames, "canon": canon, "seq_len": seq_len,
        "platforms": list(exported["video"].platforms),
        "embed_dim": int(tower_cfg.projection_dim),
        "raw_dtypes": dtypes,
        "quantize": quant_report,  # null for full precision
    }
    (out / "meta.json").write_text(json.dumps(meta, indent=1))
    return out


class ExportedEmbedder:
    """Serve from an exported artifact — no oatx model code on the import
    path (only jax + numpy + this module). Mirrors EmbedService's embed_video/
    embed_text signatures so the HTTP layer can swap backends."""

    def __init__(self, artifact_dir):
        from jax import export as jexport

        from oatx.serve.embed_service import LatencyStats

        d = Path(artifact_dir)
        self.meta = json.loads((d / "meta.json").read_text())
        self.seq_len = int(self.meta["seq_len"])  # handler contract
        # exported graphs take a SYMBOLIC batch dim — there is no bucketing,
        # but the attribute keeps the EmbedService interface (cli.serve's
        # startup banner reads it)
        self.buckets = ()
        self.stats = {"video": LatencyStats(), "text": LatencyStats()}
        self._video = jexport.deserialize((d / "video.stablehlo").read_bytes())
        self._text = jexport.deserialize((d / "text.stablehlo").read_bytes())
        flat = dict(np.load(d / "params.npz"))
        for k, (dtype, shape) in self.meta.get("raw_dtypes", {}).items():
            import ml_dtypes

            flat[k] = np.frombuffer(
                flat[k].tobytes(), getattr(ml_dtypes, dtype)).reshape(shape)
        self.params = _unflatten_params(flat)

    def embed_video(self, video_u8: np.ndarray) -> np.ndarray:
        import time

        expect = (self.meta["frames"], self.meta["canon"], self.meta["canon"], 3)
        if tuple(video_u8.shape[1:]) != expect:
            raise ValueError(
                f"video shape {video_u8.shape[1:]} != exported {expect}")
        t0 = time.perf_counter()
        out = np.asarray(self._video.call(self.params, video_u8))
        self.stats["video"].add((time.perf_counter() - t0) * 1e3)
        return out

    def embed_text(self, input_ids: np.ndarray,
                   attention_mask: np.ndarray) -> np.ndarray:
        import time

        ids = _pad_or_trim(np.asarray(input_ids, np.int32), self.seq_len)
        mask = _pad_or_trim(np.asarray(attention_mask, np.int32), self.seq_len)
        t0 = time.perf_counter()
        out = np.asarray(self._text.call(self.params, ids, mask))
        self.stats["text"].add((time.perf_counter() - t0) * 1e3)
        return out

    def latency_summary(self):
        return {k: v.summary() for k, v in self.stats.items()}


def _pad_or_trim(x: np.ndarray, length: int) -> np.ndarray:
    """Exported text graphs have a FIXED token length (only the batch is
    symbolic): right-pad with zeros / trim to fit, like the service's
    fixed-seq_len tokenizer contract."""
    if x.shape[1] == length:
        return x
    if x.shape[1] > length:
        return x[:, :length]
    pad = np.zeros((x.shape[0], length - x.shape[1]), x.dtype)
    return np.concatenate([x, pad], axis=1)
