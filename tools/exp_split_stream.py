"""Prototype: split-stream residual (patches + CLS carried as separate tensors).

The round-3 per-source-line trace attribution (tools/exp_step_trace.py) shows
~10 ms of the 77 ms bs=8 train step is slice/reshape/concat around the CLS
token in divided attention: q/k/v patch slicing (attention.py:148-150,
4.9 ms), the output [cls, patches] concat (:201, 1.9 ms), plus the embed/final
slices. All of it exists only because the residual stream carries CLS and
patches in ONE (B, 1+F·N, D) tensor.

This prototype carries the stream as a PAIR (xp: (B, F·N, D), xc: (B, 1, D))
with identical math — the slices and the output concat structurally never
exist (CLS attention logits are computed as two einsums + a tiny (B,H,1,T)
logit concat in the legacy key order). It measures 12-block video-tower
fwd+bwd (grad wrt params, sum-of-squares loss on the pooled CLS) for the
legacy tower vs the split-stream tower on the same params, plus forward
parity.

This is NOT the nminor experiment re-litigated: physical layouts stay legacy
((B, T, H, Dh) head tensors, same einsum orders); only the container of the
residual stream changes.

Usage: python tools/exp_split_stream.py [batch] [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from oatx.models import vit_spacetime as vst
    from oatx.ops.layers import layer_norm, linear, mlp, patch_embed_conv
    from oatx.ops.pallas.ln_mlp import ln_mlp

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    cfg = vst.SpaceTimeViTConfig(num_frames=4, time_init="zeros")
    LN_EPS = vst.LN_EPS
    h = cfg.num_heads
    f = 4

    def softmax_f32(logits, dtype):
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)

    def qkv_split(p, x, scale=True):
        b, t, d = x.shape
        dh = d // h
        qkv = linear(p["qkv"], x).reshape(b, t, 3, h, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if scale:
            q = q * (dh ** -0.5)
        return q, k, v

    def attn_split(p, xp, xc, mode):
        """divided attention over split streams; key order matches the legacy
        cls_position='last' path ([patches..., cls]) bit-for-bit in logits."""
        b, pn, d = xp.shape
        n = pn // f
        dh = d // h
        qp, kp, vp = qkv_split(p, xp)           # (B, P, H, Dh)
        qc, kc, vc = qkv_split(p, xc)           # (B, 1, H, Dh)

        # CLS row: attends over all P+1 tokens (legacy order: patches then cls)
        cl_p = jnp.einsum("bqhd,bkhd->bhqk", qc, kp,
                          preferred_element_type=jnp.float32)
        cl_c = jnp.einsum("bqhd,bkhd->bhqk", qc, kc,
                          preferred_element_type=jnp.float32)
        cl = jnp.concatenate([cl_p, cl_c], axis=-1)           # (B, H, 1, P+1)
        cp_ = softmax_f32(cl, xp.dtype)
        cls_out = (
            jnp.einsum("bhqk,bkhd->bqhd", cp_[..., :pn], vp,
                       preferred_element_type=jnp.float32)
            + jnp.einsum("bhqk,bkhd->bqhd", cp_[..., pn:], vc,
                         preferred_element_type=jnp.float32)
        ).astype(xp.dtype)                                    # (B, 1, H, Dh)

        if mode == "space":
            qg = qp.reshape(b, f, n, h, dh)
            kg = jnp.concatenate(
                [jnp.broadcast_to(kc[:, None], (b, f, 1, h, dh)),
                 kp.reshape(b, f, n, h, dh)], axis=2)
            vg = jnp.concatenate(
                [jnp.broadcast_to(vc[:, None], (b, f, 1, h, dh)),
                 vp.reshape(b, f, n, h, dh)], axis=2)
            logits = jnp.einsum("bfqhd,bfkhd->bfhqk", qg, kg,
                                preferred_element_type=jnp.float32)
            pr = softmax_f32(logits, xp.dtype)
            out = jnp.einsum("bfhqk,bfkhd->bfqhd", pr, vg,
                             preferred_element_type=jnp.float32)
            out = out.astype(xp.dtype).reshape(b, pn, h, dh)
        else:  # time — legacy N-minor broadcast-multiply-reduce
            qn = qp.reshape(b, f, n, h, dh).transpose(0, 3, 4, 1, 2)
            kn = kp.reshape(b, f, n, h, dh).transpose(0, 3, 4, 1, 2)
            vn = vp.reshape(b, f, n, h, dh).transpose(0, 3, 4, 1, 2)
            cls_kn = jnp.broadcast_to(
                kc[:, 0].transpose(0, 1, 2)[..., None, None]
                .reshape(b, h, dh, 1, 1), (b, h, dh, 1, n))
            cls_vn = jnp.broadcast_to(
                vc[:, 0].transpose(0, 1, 2)[..., None, None]
                .reshape(b, h, dh, 1, 1), (b, h, dh, 1, n))
            kg = jnp.concatenate([cls_kn, kn], axis=3)
            vg = jnp.concatenate([cls_vn, vn], axis=3)
            logits = jnp.sum(
                qn[:, :, :, :, None, :].astype(jnp.float32)
                * kg[:, :, :, None, :, :].astype(jnp.float32), axis=2)
            pr = jax.nn.softmax(logits, axis=-2).astype(xp.dtype)
            out = jnp.sum(pr[:, :, None] * vg[:, :, :, None], axis=4)
            out = out.transpose(0, 3, 4, 1, 2).reshape(b, pn, h, dh)

        yp = linear(p["proj"], out.reshape(b, pn, d))
        yc = linear(p["proj"], cls_out.reshape(b, 1, d))
        return yp, yc

    def attn_split2(p, xp, xc, mode):
        """v2: like attn_split but with NO key/value concats — the CLS key's
        contribution to each group softmax is merged analytically (two-part
        streaming softmax: m = max(max_k l_p, l_c), out = (Σ e_p·v + e_c·v_c)/Z)."""
        b, pn, d = xp.shape
        n = pn // f
        dh = d // h
        qp, kp, vp = qkv_split(p, xp)           # (B, P, H, Dh)
        qc, kc, vc = qkv_split(p, xc)           # (B, 1, H, Dh)

        # CLS row over all P+1 tokens (same two-part merge)
        cl_p = jnp.einsum("bqhd,bkhd->bhqk", qc, kp,
                          preferred_element_type=jnp.float32)  # (B,H,1,P)
        cl_c = jnp.einsum("bqhd,bkhd->bhqk", qc, kc,
                          preferred_element_type=jnp.float32)  # (B,H,1,1)
        m = jnp.maximum(jnp.max(cl_p, axis=-1, keepdims=True), cl_c)
        e_p = jnp.exp(cl_p - m)
        e_c = jnp.exp(cl_c - m)
        z = jnp.sum(e_p, axis=-1, keepdims=True) + e_c
        cls_out = (
            jnp.einsum("bhqk,bkhd->bqhd", (e_p / z).astype(xp.dtype), vp,
                       preferred_element_type=jnp.float32)
            + (e_c / z).transpose(0, 2, 1, 3) * vc.astype(jnp.float32)
        ).astype(xp.dtype)                                     # (B,1,H,Dh)

        if mode == "space":
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
                vc[:, None, :, :, :].astype(jnp.float32)
            out = out.astype(xp.dtype).reshape(b, pn, h, dh)
        else:  # time, N-minor; k axis = F frames + analytic CLS part
            qn = qp.reshape(b, f, n, h, dh).transpose(0, 3, 4, 1, 2)  # (B,H,Dh,F,N)
            kn = kp.reshape(b, f, n, h, dh).transpose(0, 3, 4, 1, 2)
            vn = vp.reshape(b, f, n, h, dh).transpose(0, 3, 4, 1, 2)
            lg = jnp.sum(
                qn[:, :, :, :, None, :].astype(jnp.float32)
                * kn[:, :, :, None, :, :].astype(jnp.float32), axis=2)  # (B,H,F,F,N)
            # cls-key logit per (query-frame, position): q·k_c, same for all k
            lc = jnp.einsum("bhdqn,bhd->bhqn", qn, kc[:, 0],
                            preferred_element_type=jnp.float32)[:, :, :, None, :]
            m = jnp.maximum(jnp.max(lg, axis=3, keepdims=True), lc)  # (B,H,F,1,N)
            e_g = jnp.exp(lg - m)      # (B,H,F,F,N)
            e_c = jnp.exp(lc - m)      # (B,H,F,1,N)
            z = jnp.sum(e_g, axis=3, keepdims=True) + e_c
            pg = (e_g / z).astype(xp.dtype)
            out = jnp.sum(pg[:, :, None] * vn[:, :, :, None], axis=4)  # (B,H,Dh,F,N)
            pc = (e_c / z)[:, :, :, 0, :]                              # (B,H,F,N)
            out = out + pc[:, :, None] * vc[:, 0][:, :, :, None, None].astype(jnp.float32)
            out = out.astype(xp.dtype).transpose(0, 3, 4, 1, 2).reshape(b, pn, h, dh)

        yp = linear(p["proj"], out.reshape(b, pn, d))
        yc = linear(p["proj"], cls_out.reshape(b, 1, d))
        return yp, yc

    def block_split(bp, xp, xc, attn=None):
        attn = attn or attn_split
        tp, tc = attn(bp["timeattn"], layer_norm(bp["norm3"], xp, LN_EPS),
                      layer_norm(bp["norm3"], xc, LN_EPS), "time")
        up, uc = xp + tp, xc + tc
        sp_, sc = attn(bp["attn"], layer_norm(bp["norm1"], up, LN_EPS),
                       layer_norm(bp["norm1"], uc, LN_EPS), "space")
        rp, rc = xp + sp_, xc + sc
        rp = rp + ln_mlp(bp["norm2"], bp["mlp"], rp, LN_EPS)
        rc = rc + mlp(bp["mlp"], layer_norm(bp["norm2"], rc, LN_EPS))
        return rp, rc

    def apply_split(params, video, attn=None):
        b, fr, hh, ww, c = video.shape
        n = cfg.patches_per_frame
        frames = video.reshape(b * fr, hh, ww, c)
        tokens = patch_embed_conv(params["patch_embed"], frames, cfg.patch_size)
        xp = tokens.reshape(b, fr * n, cfg.embed_dim)
        xc = jnp.broadcast_to(params["cls_token"].astype(xp.dtype),
                              (b, 1, cfg.embed_dim))
        pos = params["pos_embed"].astype(xp.dtype)
        tile_pos = jnp.tile(pos[:, 1:], (1, cfg.num_frames, 1))
        tile_temporal = jnp.repeat(
            params["temporal_embed"].astype(xp.dtype), n, axis=1)
        xp = xp + (tile_pos + tile_temporal)[:, : fr * n]
        xc = xc + pos[:, :1]
        for i in range(cfg.depth):
            bp = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
            xp, xc = block_split(bp, xp, xc, attn)
        xc = layer_norm(params["norm"], xc, LN_EPS)
        return xc[:, 0]

    params = vst.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), params)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.standard_normal((bs, f, 224, 224, 3)), jnp.bfloat16)

    def loss_legacy(p, v):
        out = vst.apply(p, cfg, v)
        return jnp.sum(out["cls"].astype(jnp.float32) ** 2)

    def loss_split(p, v):
        cls = apply_split(p, v)
        return jnp.sum(cls.astype(jnp.float32) ** 2)

    def loss_split2(p, v):
        cls = apply_split(p, v, attn_split2)
        return jnp.sum(cls.astype(jnp.float32) ** 2)

    # forward parity
    cls_l = vst.apply(params, cfg, video)["cls"]
    ref = float(jnp.max(jnp.abs(cls_l.astype(jnp.float32))))
    for nm, att in (("split", None), ("split2", attn_split2)):
        cls_s = apply_split(params, video, att)
        err = float(jnp.max(jnp.abs(cls_l.astype(jnp.float32)
                                    - cls_s.astype(jnp.float32))))
        print(f"fwd parity {nm}: max|Δ|={err:.3e} (max|cls|={ref:.3e})",
              flush=True)

    for name, fn in (("legacy", loss_legacy), ("split", loss_split),
                     ("split2", loss_split2)):
        g = jax.jit(jax.grad(fn))
        t0 = time.perf_counter()
        gr = g(params, video)
        _ = float(jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)), gr, 0.0))
        print(f"{name}: compile+1 {time.perf_counter()-t0:.1f}s", flush=True)
        for _ in range(3):
            gr = g(params, video)
        _ = float(gr["cls_token"][0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            gr = g(params, video)
        _ = float(gr["cls_token"][0, 0, 0])
        dt = (time.perf_counter() - t0) / iters
        print(f"RESULT {name}/bs{bs}: {dt*1e3:.2f} ms/step (tower fwd+bwd)",
              flush=True)


if __name__ == "__main__":
    main()
