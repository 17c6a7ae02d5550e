"""Attention ops — XLA reference implementations.

`divided_spacetime_attention` reproduces the frozen-in-time VarAttention semantics
(/root/reference/OATrans/model/video_transformer.py:79-135) as batched einsums over
explicit (B, F, N, H, Dh) shapes instead of the torch (b·h)-flattened rearrange
gymnastics: XLA maps these directly onto MXU matmuls and fuses the
softmax; no data movement is wasted on flatten/unflatten.

Semantics (must match for checkpoint parity):
  * qkv = Linear(x); heads split head-major from the fused 3·D output;
  * q pre-scaled by head_dim^-0.5;
  * the CLS token attends over ALL F·N+1 tokens;
  * patch tokens attend within their group (per-frame for space over N+1 keys,
    per-position for time over F+1 keys) with the CLS key/value prepended;
  * output = proj(concat(cls_out, group_out)).

A fused Pallas kernel with identical semantics lives in
oatx.ops.pallas.spacetime_attention; this module is the correctness oracle and the
fallback path on CPU.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from oatx.ops.layers import linear

Params = Dict[str, Any]

# Pallas kernel toggle: None = auto (TPU only), True/False = forced.
_USE_PALLAS: Optional[bool] = None

# divided-attention layout: 'legacy' (B,T,H,Dh head tensors) or 'nminor'
# (H,Dh,B,...,token-minor tensors — see _divided_attention_nminor). Measured on
# the dev chip (PERF.md round 2): legacy 77.1 ms/step vs nminor 80.4 — the
# nminor relayout trades retile passes for lane-misaligned concats/slices and a
# slower native-order qkv dot; legacy stays the default.
_LAYOUT: str = "legacy"

# split-stream CLS merge style: 'concat' (group keys = [CLS] + patches
# concatenated, reference order) or 'stream' (no key/value concats — the CLS
# key's softmax contribution is merged analytically via a two-part streaming
# softmax). Same math (both merge modes grad-parity-tested,
# tests/test_split_stream.py). 'stream' is the shipped default since round 4:
# end-to-end bench.py A/B on the dev chip measured split+concat 108.8 vs
# split+stream 114.7 clips/s (fused baseline 103.6) — PERF.md round 4.
_SPLIT_MERGE: str = "stream"


def set_split_merge(value: str) -> None:
    assert value in ("concat", "stream")
    global _SPLIT_MERGE
    _SPLIT_MERGE = value


def set_layout(value: str) -> None:
    assert value in ("legacy", "nminor")
    global _LAYOUT
    _LAYOUT = value


def set_use_pallas(value: Optional[bool]) -> None:
    global _USE_PALLAS
    _USE_PALLAS = value


def _pallas_enabled() -> bool:
    if _USE_PALLAS is not None:
        return _USE_PALLAS
    from oatx.ops.pallas.spacetime_attention import use_pallas

    return use_pallas()


def _softmax_f32(logits: jnp.ndarray, dtype) -> jnp.ndarray:
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)


def _qkv(params: Params, x: jnp.ndarray, num_heads: int,
         ln_params: Optional[Params] = None, ln_eps: float = 1e-6):
    """(B, T, D) → q, k, v each (B, T, H, Dh); q pre-scaled. When `ln_params`
    is given, x is the PRE-norm residual stream and LN+qkv run as one
    custom-VJP op (ops/pallas/ln_linear — the hand-written backward is 1.25x
    over XLA autodiff at ViT-B shapes, PERF.md round 2)."""
    b, t, d = x.shape
    head_dim = d // num_heads
    if ln_params is not None:
        from oatx.ops.pallas.ln_linear import ln_linear

        qkv = ln_linear(ln_params, params["qkv"], x, ln_eps)  # (B, T, 3D)
    else:
        qkv = linear(params["qkv"], x)  # (B, T, 3D)
    qkv = qkv.reshape(b, t, 3, num_heads, head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    q = q * (head_dim ** -0.5)
    return q, k, v


def full_attention(
    params: Params, x: jnp.ndarray, num_heads: int, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Standard MHA over the full sequence (used by the text tower and as the
    F=1 degenerate case). mask: (B, T) with 1 = attend."""
    q, k, v = _qkv(params, x, num_heads)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    if mask is not None:
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(mask[:, None, None, :].astype(bool), logits, neg)
    p = _softmax_f32(logits, x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32)
    out = out.reshape(x.shape).astype(x.dtype)
    return linear(params["proj"], out)


def divided_attention(
    params: Params,
    x: jnp.ndarray,
    num_heads: int,
    num_frames: int,
    mode: str,
    cls_pos: str = "first",
    ln_params: Optional[Params] = None,
    ln_eps: float = 1e-6,
) -> jnp.ndarray:
    """One VarAttention pass with grouping `mode` ∈ {'space', 'time'}.

    x: (B, 1 + F·N, D). cls_pos selects the token order:
      'first' — [CLS, f0p0..f0pN-1, f1p0, ...] (the reference order);
      'last'  — [f0p0..., f1p0..., CLS] (TPU layout optimization: patch
                slices/concats become tile-ALIGNED prefix ops — the +1 offset
                of cls-first forces misaligned copies of every head tensor,
                profiled at several ms/step; see PERF.md round 2).
    Semantics are identical either way (the caller permutes tokens).
    """
    b, t, d = x.shape
    f = num_frames
    n = (t - 1) // f
    assert 1 + f * n == t, f"token count {t} incompatible with {f} frames"
    h = num_heads
    dh = d // h
    first = cls_pos == "first"

    if _LAYOUT == "nminor" and not (mode == "space" and _pallas_enabled() and first):
        from oatx.ops.layers import layer_norm

        xx = layer_norm(ln_params, x, ln_eps) if ln_params is not None else x
        return _divided_attention_nminor(params, xx, h, f, n, mode, first)

    q, k, v = _qkv(params, x, h, ln_params, ln_eps)  # (B, T, H, Dh), q scaled

    # CLS row: attends over every token (both groupings do this identically).
    cls_q = q[:, :1] if first else q[:, -1:]
    cls_logits = jnp.einsum("bqhd,bkhd->bhqk", cls_q, k, preferred_element_type=jnp.float32)
    cls_p = _softmax_f32(cls_logits, x.dtype)
    cls_out = jnp.einsum("bhqk,bkhd->bqhd", cls_p, v, preferred_element_type=jnp.float32)
    cls_out = cls_out.astype(x.dtype)  # (B, 1, H, Dh)

    # Patch tokens grouped.
    psl = slice(1, None) if first else slice(None, t - 1)
    qp = q[:, psl].reshape(b, f, n, h, dh)
    kp = k[:, psl].reshape(b, f, n, h, dh)
    vp = v[:, psl].reshape(b, f, n, h, dh)
    cls_k = k[:, :1] if first else k[:, -1:]  # (B, 1, H, Dh)
    cls_v = v[:, :1] if first else v[:, -1:]

    if mode == "space" and _pallas_enabled() and first:
        # the fused kernel's layout contract is CLS-first (spacetime_attention
        # kernel rows); with cls_position='last' (the TPU default) fall through
        # to the XLA path rather than silently mis-grouping tokens
        from oatx.ops.pallas.spacetime_attention import space_attention

        out_full = space_attention(q, k, v, f)
        return linear(params["proj"], out_full.reshape(b, t, d))

    if mode == "space":
        # groups = frames: (B, F, N, H, Dh); keys = [CLS] + frame patches
        kg = jnp.concatenate([jnp.broadcast_to(cls_k[:, None], (b, f, 1, h, dh)), kp], axis=2)
        vg = jnp.concatenate([jnp.broadcast_to(cls_v[:, None], (b, f, 1, h, dh)), vp], axis=2)
        logits = jnp.einsum("bfqhd,bfkhd->bfhqk", qp, kg, preferred_element_type=jnp.float32)
        p = _softmax_f32(logits, x.dtype)
        out = jnp.einsum("bfhqk,bfkhd->bfqhd", p, vg, preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).reshape(b, f * n, h, dh)
    elif mode == "time":
        # groups = patch positions; keys = [CLS] + same-position frames.
        #
        # TPU layout note: the naive einsum puts (q=F, k=F+1) as the two minor
        # dims of the logits — with F=4 the (8,128)/(16,128) tiling pads that
        # tensor ~25x (observed 424MB of padding at B=16). FLOPs here are
        # trivial (~0.1 GFLOP), so compute attention with N as the minor dim
        # instead: broadcast-multiply-reduce over Dh, logits (B,H,F,F+1,N) —
        # tile padding drops to ~2x and XLA fuses the reductions on the VPU.
        qn = qp.transpose(0, 3, 4, 1, 2)  # (B, H, Dh, F, N)
        kn = kp.transpose(0, 3, 4, 1, 2)
        vn = vp.transpose(0, 3, 4, 1, 2)
        cls_kn = cls_k.transpose(0, 2, 3, 1)[:, :, :, :, None]  # (B, H, Dh, 1, 1)
        cls_kn = jnp.broadcast_to(cls_kn, (b, h, dh, 1, n))
        cls_vn = cls_v.transpose(0, 2, 3, 1)[:, :, :, :, None]
        cls_vn = jnp.broadcast_to(cls_vn, (b, h, dh, 1, n))
        kg = jnp.concatenate([cls_kn, kn], axis=3)  # (B, H, Dh, F+1, N)
        vg = jnp.concatenate([cls_vn, vn], axis=3)
        # logits[b,h,q,k,n] = sum_d q[b,h,d,q,n] * k[b,h,d,k,n]
        logits = jnp.sum(
            qn[:, :, :, :, None, :].astype(jnp.float32)
            * kg[:, :, :, None, :, :].astype(jnp.float32), axis=2)
        p = jax.nn.softmax(logits, axis=-2).astype(x.dtype)  # over k
        # out[b,h,d,q,n] = sum_k p[b,h,q,k,n] * v[b,h,d,k,n]
        out = jnp.sum(p[:, :, None] * vg[:, :, :, None], axis=4)  # (B,H,Dh,F,N)
        out = out.transpose(0, 3, 4, 1, 2).reshape(b, f * n, h, dh)
    else:
        raise ValueError(f"mode must be 'space' or 'time', got {mode!r}")

    parts = [cls_out, out] if first else [out, cls_out]
    full = jnp.concatenate(parts, axis=1).reshape(b, t, d)
    return linear(params["proj"], full)


def divided_attention_split(
    params: Params,
    xp: jnp.ndarray,
    xc: jnp.ndarray,
    num_heads: int,
    num_frames: int,
    mode: str,
):
    """One VarAttention pass over a SPLIT residual stream (TPU layout win).

    xp: (B, F·N, D) patch tokens, xc: (B, 1, D) CLS — the same math as
    `divided_attention` (reference VarAttention,
    /root/reference/OATrans/model/video_transformer.py:79-135), but with the
    CLS token carried as its own tensor so the patch slice (q[:, 1:] /
    q[:, :-1]) and the output [patches, cls] concatenate structurally never
    exist. Per-source-line trace attribution measured those ops at ~7 ms of
    the 77 ms bs=8 train step; the split tower runs the 12-block fwd+bwd
    8.4% faster (PERF.md round 3 "Split-stream residual").

    Head tensors keep the legacy (B, T, H, Dh) physical layout and einsum
    orders (this is NOT the rejected nminor relayout). The CLS row's softmax
    runs over a [patch-logits, cls-logit] concat in the legacy
    cls_position='last' key order, so logits match the fused path
    elementwise. Returns (yp, yc).
    """
    b, pn, d = xp.shape
    f = num_frames
    n = pn // f
    assert f * n == pn, f"patch count {pn} incompatible with {f} frames"
    h = num_heads
    dh = d // h

    qp, kp, vp = _qkv(params, xp, h)   # (B, P, H, Dh), q pre-scaled
    qc, kc, vc = _qkv(params, xc, h)   # (B, 1, H, Dh)
    stream = _SPLIT_MERGE == "stream"

    # CLS row: attends over every token. Two einsums + a (B, H, 1, P+1) logit
    # concat (tiny) replace the full-stream einsum; key order = legacy 'last'.
    cl_p = jnp.einsum("bqhd,bkhd->bhqk", qc, kp, preferred_element_type=jnp.float32)
    cl_c = jnp.einsum("bqhd,bkhd->bhqk", qc, kc, preferred_element_type=jnp.float32)
    if stream:
        m = jnp.maximum(jnp.max(cl_p, axis=-1, keepdims=True), cl_c)
        e_p = jnp.exp(cl_p - m)
        e_c = jnp.exp(cl_c - m)
        z = jnp.sum(e_p, axis=-1, keepdims=True) + e_c
        cls_out = (
            jnp.einsum("bhqk,bkhd->bqhd", (e_p / z).astype(xp.dtype), vp,
                       preferred_element_type=jnp.float32)
            + (e_c / z).transpose(0, 2, 1, 3) * vc.astype(jnp.float32)
        ).astype(xp.dtype)
    else:
        cp = _softmax_f32(jnp.concatenate([cl_p, cl_c], axis=-1), xp.dtype)
        cls_out = (
            jnp.einsum("bhqk,bkhd->bqhd", cp[..., :pn], vp,
                       preferred_element_type=jnp.float32)
            + jnp.einsum("bhqk,bkhd->bqhd", cp[..., pn:], vc,
                         preferred_element_type=jnp.float32)
        ).astype(xp.dtype)                                 # (B, 1, H, Dh)

    if mode == "space" and stream:
        # no key/value concat: group softmax over patch keys with the CLS
        # key's contribution merged analytically (two-part streaming softmax)
        qg = qp.reshape(b, f, n, h, dh)
        kg = kp.reshape(b, f, n, h, dh)
        vg = vp.reshape(b, f, n, h, dh)
        lg = jnp.einsum("bfqhd,bfkhd->bfhqk", qg, kg,
                        preferred_element_type=jnp.float32)  # (B,F,H,N,N)
        lc = jnp.einsum("bfqhd,bhd->bfhq", qg, kc[:, 0],
                        preferred_element_type=jnp.float32)[..., None]
        m = jnp.maximum(jnp.max(lg, axis=-1, keepdims=True), lc)
        e_g = jnp.exp(lg - m)
        e_c = jnp.exp(lc - m)
        z = jnp.sum(e_g, axis=-1, keepdims=True) + e_c
        out = jnp.einsum("bfhqk,bfkhd->bfqhd", (e_g / z).astype(xp.dtype), vg,
                         preferred_element_type=jnp.float32)
        out = out + (e_c / z).transpose(0, 1, 3, 2, 4) * \
            vc[:, None].astype(jnp.float32)
        out = out.astype(xp.dtype).reshape(b, pn, h, dh)
    elif mode == "time" and stream:
        qn = qp.reshape(b, f, n, h, dh).transpose(0, 3, 4, 1, 2)  # (B,H,Dh,F,N)
        kn = kp.reshape(b, f, n, h, dh).transpose(0, 3, 4, 1, 2)
        vn = vp.reshape(b, f, n, h, dh).transpose(0, 3, 4, 1, 2)
        lg = jnp.sum(
            qn[:, :, :, :, None, :].astype(jnp.float32)
            * kn[:, :, :, None, :, :].astype(jnp.float32), axis=2)  # (B,H,F,F,N)
        lc = jnp.einsum("bhdqn,bhd->bhqn", qn, kc[:, 0],
                        preferred_element_type=jnp.float32)[:, :, :, None, :]
        m = jnp.maximum(jnp.max(lg, axis=3, keepdims=True), lc)    # (B,H,F,1,N)
        e_g = jnp.exp(lg - m)
        e_c = jnp.exp(lc - m)
        z = jnp.sum(e_g, axis=3, keepdims=True) + e_c
        pg = (e_g / z).astype(xp.dtype)
        out = jnp.sum(pg[:, :, None] * vn[:, :, :, None], axis=4)  # (B,H,Dh,F,N)
        pc = (e_c / z)[:, :, :, 0, :]                              # (B,H,F,N)
        out = out + pc[:, :, None] * \
            vc[:, 0][:, :, :, None, None].astype(jnp.float32)
        out = out.astype(xp.dtype).transpose(0, 3, 4, 1, 2).reshape(b, pn, h, dh)
    elif mode == "space":
        # groups = frames; keys = [CLS] + frame patches (reference concat order)
        qg = qp.reshape(b, f, n, h, dh)
        kg = jnp.concatenate(
            [jnp.broadcast_to(kc[:, None], (b, f, 1, h, dh)),
             kp.reshape(b, f, n, h, dh)], axis=2)
        vg = jnp.concatenate(
            [jnp.broadcast_to(vc[:, None], (b, f, 1, h, dh)),
             vp.reshape(b, f, n, h, dh)], axis=2)
        logits = jnp.einsum("bfqhd,bfkhd->bfhqk", qg, kg,
                            preferred_element_type=jnp.float32)
        p = _softmax_f32(logits, xp.dtype)
        out = jnp.einsum("bfhqk,bfkhd->bfqhd", p, vg,
                         preferred_element_type=jnp.float32)
        out = out.astype(xp.dtype).reshape(b, pn, h, dh)
    elif mode == "time":
        # groups = patch positions, N-minor tiling (see the legacy branch's
        # layout note); keys = [CLS] + same-position frames.
        qn = qp.reshape(b, f, n, h, dh).transpose(0, 3, 4, 1, 2)  # (B,H,Dh,F,N)
        kn = kp.reshape(b, f, n, h, dh).transpose(0, 3, 4, 1, 2)
        vn = vp.reshape(b, f, n, h, dh).transpose(0, 3, 4, 1, 2)
        cls_kn = jnp.broadcast_to(
            kc[:, 0][..., None], (b, h, dh, n))[:, :, :, None, :]
        cls_vn = jnp.broadcast_to(
            vc[:, 0][..., None], (b, h, dh, n))[:, :, :, None, :]
        kg = jnp.concatenate([cls_kn, kn], axis=3)  # (B, H, Dh, F+1, N)
        vg = jnp.concatenate([cls_vn, vn], axis=3)
        logits = jnp.sum(
            qn[:, :, :, :, None, :].astype(jnp.float32)
            * kg[:, :, :, None, :, :].astype(jnp.float32), axis=2)
        p = jax.nn.softmax(logits, axis=-2).astype(xp.dtype)  # over k
        out = jnp.sum(p[:, :, None] * vg[:, :, :, None], axis=4)  # (B,H,Dh,F,N)
        out = out.transpose(0, 3, 4, 1, 2).reshape(b, pn, h, dh)
    else:
        raise ValueError(f"mode must be 'space' or 'time', got {mode!r}")

    yp = linear(params["proj"], out.reshape(b, pn, d))
    yc = linear(params["proj"], cls_out.reshape(b, 1, d))
    return yp, yc


def _divided_attention_nminor(
    params: Params, x: jnp.ndarray, h: int, f: int, n: int, mode: str,
    first: bool = True,
) -> jnp.ndarray:
    """divided_attention with token-minor head tensors (TPU layout optimization).

    Identical math to the legacy path, different physical layout. The legacy
    (B, T, H, Dh) head tensors put (H, Dh) = (12, 64) on the (8, 128)-tiled
    minor dims — 2.7× padding that every slice/reshape/concat/transpose pays
    (profiled at ~27 ms of a 78 ms train step, PERF.md round 2). Here every
    head tensor is (H, Dh, B, ..., tokens): heads/head-dim are major (exact
    tiles), the token axis rides the 128-lane dim, and qkv is produced directly
    in its native dot order 'de,btd->ebt' so no retile pass exists at all. The
    time branch needs no transposes (it is already N-minor — the legacy path's
    layout fix, PERF.md finding 1, falls out for free) and the output
    projection contracts straight from the head-major layout back to (B, T, D).
    """
    b, t, d = x.shape
    dh = d // h
    dt = x.dtype

    w = params["qkv"]["kernel"].astype(dt)          # (D, 3D)
    bias = params["qkv"]["bias"].astype(dt)         # (3D,)
    qkv = jnp.einsum("de,btd->ebt", w, x) + bias[:, None, None]  # (3D, B, T)
    q = qkv[:d].reshape(h, dh, b, t) * (dh ** -0.5)
    k = qkv[d:2 * d].reshape(h, dh, b, t)
    v = qkv[2 * d:].reshape(h, dh, b, t)

    ci = 0 if first else t - 1
    psl = slice(1, None) if first else slice(None, t - 1)

    # CLS row: attends over every token (both groupings do this identically).
    cls_logits = jnp.einsum("hdb,hdbk->bhk", q[..., ci], k,
                            preferred_element_type=jnp.float32)
    cls_p = _softmax_f32(cls_logits, dt)
    cls_out = jnp.einsum("bhk,hdbk->bhd", cls_p, v,
                         preferred_element_type=jnp.float32)
    cls_out = cls_out.reshape(b, d).astype(dt)      # h-major flatten == legacy

    qp = q[..., psl].reshape(h, dh, b, f, n)
    kp = k[..., psl].reshape(h, dh, b, f, n)
    vp = v[..., psl].reshape(h, dh, b, f, n)
    k_cls = k[..., ci]                              # (H, Dh, B)
    v_cls = v[..., ci]

    if mode == "space":
        # keys per frame = [CLS] + frame patches, concatenated on the lane axis
        kg = jnp.concatenate(
            [jnp.broadcast_to(k_cls[:, :, :, None, None], (h, dh, b, f, 1)), kp],
            axis=4)
        vg = jnp.concatenate(
            [jnp.broadcast_to(v_cls[:, :, :, None, None], (h, dh, b, f, 1)), vp],
            axis=4)
        logits = jnp.einsum("hdbfq,hdbfk->hbfqk", qp, kg,
                            preferred_element_type=jnp.float32)
        p = _softmax_f32(logits, dt)
        out = jnp.einsum("hbfqk,hdbfk->hdbfq", p, vg,
                         preferred_element_type=jnp.float32).astype(dt)
    elif mode == "time":
        # keys per patch position = [CLS] + same-position frames. The (q=F,
        # k=F+1) dims stay OFF the minor tiles (see legacy branch's layout
        # note); logits are computed as a broadcast-multiply-reduce over Dh.
        kg = jnp.concatenate(
            [jnp.broadcast_to(k_cls[:, :, :, None, None], (h, dh, b, 1, n)), kp],
            axis=3)                                  # (H, Dh, B, F+1, N)
        vg = jnp.concatenate(
            [jnp.broadcast_to(v_cls[:, :, :, None, None], (h, dh, b, 1, n)), vp],
            axis=3)
        logits = jnp.sum(
            qp[:, :, :, :, None, :].astype(jnp.float32)
            * kg[:, :, :, None, :, :].astype(jnp.float32), axis=1)  # (H,B,F,F+1,N)
        p = jax.nn.softmax(logits, axis=-2).astype(dt)
        out = jnp.sum(p[:, None] * vg[:, :, :, None], axis=4)       # (H,Dh,B,F,N)
    else:
        raise ValueError(f"mode must be 'space' or 'time', got {mode!r}")

    # output projection straight from the head-major layout back to (B, T, D)
    wp = params["proj"]["kernel"].astype(dt).reshape(h, dh, d)
    bp = params["proj"]["bias"].astype(dt)
    y_p = jnp.einsum("hdbfq,hdo->bfqo", out, wp).reshape(b, f * n, d)
    y_c = jnp.einsum("be,eo->bo", cls_out, wp.reshape(d, d))
    parts = [y_c[:, None], y_p] if first else [y_p, y_c[:, None]]
    return jnp.concatenate(parts, axis=1) + bp
