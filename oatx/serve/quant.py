"""Weight-only int8 quantization for serving.

Post-training, symmetric, per-output-channel int8 quantization of the matmul
kernels — the standard production recipe for inference weight compression.
Small-batch serving is WEIGHT-bound (every request streams the full parameter
set from HBM; PERF.md's serving decomposition), so storing kernels as int8
and dequantizing inside the compiled graph cuts that traffic ~4x and the
artifact/params size with it; XLA fuses the int8→float convert+scale into the
consuming matmul's prologue, the same way it fuses the bf16 casts the towers
already do.

Scope is deliberately the serving path only (tools/export_serving.py
--quantize, cli/serve.py --quantize, EmbedService(quantize=...)): training
keeps f32 master weights (CLAUDE.md precision conventions). The reference has
no quantization story at all (its eval path is full-precision torch —
SURVEY.md §2); this is an oatx-only capability.

Design: a quantized tree is the SAME pytree with each eligible leaf replaced
by a plain-dict marker node {"q8": int8, "q8_scale": f32} — plain dicts so
the tree round-trips through the artifact's flattened npz and jax.export's
input treedef with no custom pytree registration. `dequantize_tree` runs
INSIDE the jitted/exported function, so the int8 weights are what lives in
HBM (and in the artifact), not a dequantized copy.

Eligibility is by the repo's own naming convention (CLAUDE.md): every matmul
weight is a leaf named "kernel" — linears (in, out), stacked block kernels
(L, in, out), patch-embed convs (H, W, I, O). Everything else (biases, LN
scales, token/positional embeddings, cls tokens) stays in full precision;
those are a tiny fraction of bytes and the precision-sensitive part.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

Q_KEY = "q8"
SCALE_KEY = "q8_scale"
_MARKER_KEYS = frozenset((Q_KEY, SCALE_KEY))


def is_quantized_leaf(node: Any) -> bool:
    return isinstance(node, dict) and frozenset(node.keys()) == _MARKER_KEYS


def _contraction_axes(ndim: int) -> Tuple[int, ...]:
    """Axes reduced for the per-output-channel scale.

    Kernels follow the repo layout conventions: 2D linear (in, out) → reduce
    in; 3D stacked blocks (L, in, out) → reduce in, keep the depth-stack axis
    so every layer gets its own channel scales; 4D conv HWIO → reduce H,W,I.
    """
    if ndim == 2:
        return (0,)
    if ndim == 3:
        return (1,)
    if ndim == 4:
        return (0, 1, 2)
    raise ValueError(f"unsupported kernel rank {ndim}")


def quantize_array(w: np.ndarray) -> Dict[str, np.ndarray]:
    """Symmetric per-out-channel int8: w ≈ q * scale, q ∈ [-127, 127]."""
    w = np.asarray(w, np.float32)
    axes = _contraction_axes(w.ndim)
    amax = np.max(np.abs(w), axis=axes, keepdims=True)
    scale = np.maximum(amax, np.finfo(np.float32).tiny) / 127.0
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return {Q_KEY: q, SCALE_KEY: scale.astype(np.float32)}


def dequantize_array(node: Dict[str, Any], dtype=np.float32):
    import jax.numpy as jnp

    return (jnp.asarray(node[Q_KEY]).astype(dtype)
            * jnp.asarray(node[SCALE_KEY]).astype(dtype))


def quantize_tree(params, *, min_elems: int = 4096):
    """Replace every "kernel"-named leaf with >= min_elems elements by an
    int8 marker node; everything else passes through untouched (same arrays,
    not copies). min_elems keeps tiny kernels (projection heads on toy
    configs) exact — their bytes don't matter and their channel counts are
    too small for stable scales."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (k == "kernel" and hasattr(v, "size")
                        and v.size >= min_elems and 2 <= np.ndim(v) <= 4
                        and np.asarray(v).dtype.kind in "fV"):
                    out[k] = quantize_array(np.asarray(v, np.float32))
                else:
                    out[k] = walk(v)
            return out
        return node

    if not isinstance(params, dict):
        raise TypeError("quantize_tree expects the nested-dict param pytree")
    tree = walk(params)
    n_q = sum(is_quantized_leaf(x) for x in _marker_nodes(tree))
    if n_q == 0:
        raise ValueError(
            f"quantize_tree: no kernel >= {min_elems} elements found — "
            "wrong tree or min_elems too high")
    return tree


def dequantize_tree(params, dtype=np.float32):
    """Inverse transform, for use INSIDE the jitted serving function: marker
    nodes become dense kernels again (XLA fuses the convert+scale into the
    consumer); plain leaves pass through."""

    def walk(node):
        if is_quantized_leaf(node):
            return dequantize_array(node, dtype)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def _marker_nodes(tree):
    if is_quantized_leaf(tree):
        yield tree
        return
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _marker_nodes(v)


def quantization_report(params, qparams) -> Dict[str, Any]:
    """Byte accounting for logs/meta: how much the int8 transform saved."""
    import jax

    def nbytes(t):
        return int(sum(np.asarray(l).nbytes
                       for l in jax.tree_util.tree_leaves(t)))

    n_q = sum(1 for _ in _marker_nodes(qparams))
    return {"mode": "int8", "quantized_kernels": n_q,
            "bytes_full": nbytes(params), "bytes_quantized": nbytes(qparams)}
