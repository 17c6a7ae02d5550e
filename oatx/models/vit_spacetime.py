"""SpaceTimeTransformer — divided space-time ViT video tower (JAX).

Re-implements the behavior of the reference tower
(/root/reference/OATrans/model/video_transformer.py:179-357) and its object-aware
variants (oa_video_transformer_region.py — layer-K region tap through a separate
region_norm; oa_video_transformer_global_local.py — ½·CLS + ½·mean(patch) pooling)
as one configurable functional model.

TPU-first design:
  * blocks are stacked along a depth axis and iterated with lax.scan (single
    compiled block body);
  * NHWC video layout, f32 softmax/LN statistics under a bf16 compute policy;
  * optional jax.checkpoint (remat) around the scanned block for memory;
  * shape-polymorphic over frame count F ≤ num_frames at trace time (F is static
    per compiled specialization — the CC3M(1-frame)/WebVid(4-frame) alternation
    compiles two specializations, matching the reference's two batch shapes).

Block wiring (reference SpaceTimeBlock.forward, video_transformer.py:161-176):
    t = time_attn(norm3(x));  u = x + t
    s = space_attn(norm1(u)); r = x + s          # NOTE: residual from x, not u
    out = r + mlp(norm2(r))
Time attention is zero-initialized ('zeros') so an F=1 model degenerates exactly to
the underlying ViT.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from oatx.core.module import Params, stack_params, trunc_normal
from oatx.ops.attention import divided_attention
from oatx.ops.layers import layer_norm, linear, mlp, patch_embed_conv

LN_EPS = 1e-6  # reference norm_layer = partial(nn.LayerNorm, eps=1e-6)


@dataclasses.dataclass(frozen=True)
class SpaceTimeViTConfig:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_frames: int = 4               # maximum frames (temporal embed length)
    time_init: str = "zeros"          # 'zeros' | 'random'
    region_tap_layer: Optional[int] = None  # e.g. 6 → also return layer-6 patches
    pooling: str = "cls"              # 'cls' | 'cls_mean_half' (global-local)
    remat: bool = False               # remat each block (memory ↔ flops trade)
    remat_policy: str = "full"        # 'full' (save block inputs only)
    # | 'dots' (save non-batch dot outputs, recompute the rest)
    # | 'dots_all' (save EVERY dot output incl. batch dims — least recompute,
    #   most memory of the remat modes; the right point when full remat fits
    #   with headroom and backward recompute dominates step time)
    scan_blocks: bool = False         # lax.scan over stacked blocks vs unrolled loop.
    # Unrolled measures ~30% faster fwd+bwd on TPU (no scan-carry HBM round trips
    # or residual stacking — PERF.md) at similar compile time; scan remains
    # available for very deep models where compile time dominates.
    cls_position: str = "last"        # 'last' | 'first' — activation token order.
    # Purely internal: params keep the reference order (pos_embed row 0 = CLS),
    # outputs are identical; 'last' makes every patch slice/concat tile-aligned
    # on TPU (the cls-first +1 offset forces misaligned copies — PERF.md round 2).
    pipeline_stages: int = 1          # >1: GPipe pipeline over the block stack
    # (parallel/pipeline.py) — the model mesh axis holds stages instead of
    # Megatron TP shards; region_tap unsupported in this mode.
    pipeline_microbatches: int = 4
    fused_qkv: bool = False           # LN→qkv as one custom-VJP op (XLA fwd +
    # hand-written backward, ops/pallas/ln_linear). Measured 1.25x on the
    # ISOLATED sublayer fwd+bwd but 0.92x on the full train step (103.6 →
    # 95.0 clips/s): the custom_vjp boundary blocks XLA's cross-op fusion
    # with the surrounding attention/residual graph. Kept opt-in as a
    # documented negative result (PERF.md round 2).
    sequence_parallel: bool = False   # shard the TOKEN axis of activations over
    # the 'model' mesh axis between blocks (GSPMD sequence parallelism: the
    # LN/residual/elementwise regions hold 1/mp of the (B, T, D) activations
    # per chip; XLA inserts the all-gather/reduce-scatter pairs around the TP
    # matmuls). Memory lever for long token counts (16-frame clips = 3137
    # tokens); numerically identical (tests/test_sharding_rules.py).
    split_cls_stream: bool = True     # carry the residual stream as a PAIR
    # (patches (B, F·N, D), CLS (B, 1, D)) instead of one (B, 1+F·N, D)
    # tensor: the per-attention patch slice and output [patches, cls] concat
    # structurally never exist (~7 ms of the 77 ms bs=8 train step in the
    # round-3 per-source-line trace). SHIPPED DEFAULT since round 4: the
    # end-to-end bench.py A/B measured 103.6 → 108.8 clips/s (1.050×) with
    # the 'concat' CLS merge and → 114.7 (1.107×, MFU 0.326) with the
    # 'stream' merge (PERF.md round 4). Numerics match the fused stream
    # (logit key order is preserved); falls back to the fused path under
    # pipeline parallelism and fused_qkv (see apply()).
    fused_mlp: bool = True            # fused LN→fc1→GELU→fc2 (ops/pallas/ln_mlp):
    # measured 1.18× on fwd+bwd at ViT-B shapes on the dev chip (PERF.md round
    # 2 — the win is the leaner custom VJP; fwd alone is matmul-bound). The
    # Pallas path engages only on TPU and only when the registered mesh has
    # no model axis (pallas_call carries no GSPMD partitioning rule — it would
    # replicate TP-sharded MLP weights); see ops/pallas/ln_mlp.use_pallas.

    @property
    def patches_per_frame(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


def _init_attn(rng: jax.Array, dim: int, zeros: bool) -> Params:
    r1, r2 = jax.random.split(rng)
    if zeros:
        # reference VarAttention initialize='zeros' (video_transformer.py:89-95):
        # qkv zeroed, proj weight filled with ONES, proj bias zero.
        return {
            "qkv": {"kernel": jnp.zeros((dim, 3 * dim)), "bias": jnp.zeros((3 * dim,))},
            "proj": {"kernel": jnp.ones((dim, dim)), "bias": jnp.zeros((dim,))},
        }
    return {
        "qkv": {"kernel": trunc_normal(r1, (dim, 3 * dim)), "bias": jnp.zeros((3 * dim,))},
        "proj": {"kernel": trunc_normal(r2, (dim, dim)), "bias": jnp.zeros((dim,))},
    }


def _init_block(rng: jax.Array, cfg: SpaceTimeViTConfig) -> Params:
    rs = jax.random.split(rng, 4)
    dim, hidden = cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio)
    ln = lambda: {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
    return {
        "norm1": ln(),
        "norm2": ln(),
        "norm3": ln(),
        "attn": _init_attn(rs[0], dim, zeros=False),
        "timeattn": _init_attn(rs[1], dim, zeros=(cfg.time_init == "zeros")),
        "mlp": {
            "fc1": {"kernel": trunc_normal(rs[2], (dim, hidden)), "bias": jnp.zeros((hidden,))},
            "fc2": {"kernel": trunc_normal(rs[3], (hidden, dim)), "bias": jnp.zeros((dim,))},
        },
    }


def init(rng: jax.Array, cfg: SpaceTimeViTConfig) -> Params:
    n = cfg.patches_per_frame
    rs = jax.random.split(rng, cfg.depth + 4)
    params: Params = {
        "patch_embed": {
            "kernel": trunc_normal(
                rs[0], (cfg.patch_size, cfg.patch_size, cfg.in_chans, cfg.embed_dim)
            ),
            "bias": jnp.zeros((cfg.embed_dim,)),
        },
        "cls_token": trunc_normal(rs[1], (1, 1, cfg.embed_dim)),
        "pos_embed": trunc_normal(rs[2], (1, n + 1, cfg.embed_dim)),
        "temporal_embed": jnp.zeros((1, cfg.num_frames, cfg.embed_dim)),
        "blocks": stack_params([_init_block(r, cfg) for r in rs[3: 3 + cfg.depth]]),
        "norm": {"scale": jnp.ones((cfg.embed_dim,)), "bias": jnp.zeros((cfg.embed_dim,))},
    }
    if cfg.region_tap_layer is not None:
        params["region_norm"] = {
            "scale": jnp.ones((cfg.embed_dim,)),
            "bias": jnp.zeros((cfg.embed_dim,)),
        }
    return params


def _block_apply(cfg: SpaceTimeViTConfig, bp: Params, x: jnp.ndarray, f: int) -> jnp.ndarray:
    cp = cfg.cls_position
    if cfg.fused_qkv:
        # pre-norm LN rides inside the attention qkv op (custom VJP)
        t_out = divided_attention(bp["timeattn"], x, cfg.num_heads, f,
                                  mode="time", cls_pos=cp,
                                  ln_params=bp["norm3"], ln_eps=LN_EPS)
        u = x + t_out
        s_out = divided_attention(bp["attn"], u, cfg.num_heads, f,
                                  mode="space", cls_pos=cp,
                                  ln_params=bp["norm1"], ln_eps=LN_EPS)
    else:
        t_out = divided_attention(bp["timeattn"], layer_norm(bp["norm3"], x, LN_EPS),
                                  cfg.num_heads, f, mode="time", cls_pos=cp)
        u = x + t_out
        s_out = divided_attention(bp["attn"], layer_norm(bp["norm1"], u, LN_EPS),
                                  cfg.num_heads, f, mode="space", cls_pos=cp)
    r = x + s_out  # frozen-in-time style: residual from block input
    if cfg.fused_mlp:
        from oatx.ops.pallas.ln_mlp import ln_mlp

        return r + ln_mlp(bp["norm2"], bp["mlp"], r, LN_EPS)
    return r + mlp(bp["mlp"], layer_norm(bp["norm2"], r, LN_EPS))


def _block_apply_split(
    cfg: SpaceTimeViTConfig, bp: Params, xp: jnp.ndarray, xc: jnp.ndarray, f: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """_block_apply over the split (patches, CLS) residual stream — identical
    wiring, no slice/concat around the attention calls. The CLS stream's MLP
    runs the plain XLA path (B rows; a Pallas call would cost more than the
    matmul) while the patch stream keeps the fused LN→MLP kernel."""
    from oatx.ops.attention import divided_attention_split

    tp, tc = divided_attention_split(
        bp["timeattn"], layer_norm(bp["norm3"], xp, LN_EPS),
        layer_norm(bp["norm3"], xc, LN_EPS), cfg.num_heads, f, mode="time")
    up, uc = xp + tp, xc + tc
    sp, sc = divided_attention_split(
        bp["attn"], layer_norm(bp["norm1"], up, LN_EPS),
        layer_norm(bp["norm1"], uc, LN_EPS), cfg.num_heads, f, mode="space")
    rp, rc = xp + sp, xc + sc  # frozen-in-time style: residual from block input
    if cfg.fused_mlp:
        from oatx.ops.pallas.ln_mlp import ln_mlp

        rp = rp + ln_mlp(bp["norm2"], bp["mlp"], rp, LN_EPS)
    else:
        rp = rp + mlp(bp["mlp"], layer_norm(bp["norm2"], rp, LN_EPS))
    rc = rc + mlp(bp["mlp"], layer_norm(bp["norm2"], rc, LN_EPS))
    return rp, rc


def _patches(cfg: SpaceTimeViTConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Patch-token rows of x in frame-major order (cls_position-aware)."""
    return x[:, 1:] if cfg.cls_position == "first" else x[:, :-1]


def embed_split(
    params: Params, cfg: SpaceTimeViTConfig, video: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """video (B, F, H, W, C) NHWC → (patch tokens (B, F·N, D), CLS (B, 1, D))
    with pos/temporal embeddings added (reference forward_features,
    video_transformer.py:303-325). The streams stay separate (split_cls_stream)
    or are concatenated by `embed` for the fused path."""
    b, f, hh, ww, c = video.shape
    assert f <= cfg.num_frames, f"{f} frames > configured max {cfg.num_frames}"
    n = cfg.patches_per_frame
    frames = video.reshape(b * f, hh, ww, c)
    tokens = patch_embed_conv(params["patch_embed"], frames, cfg.patch_size)
    tokens = tokens.reshape(b, f * n, cfg.embed_dim)

    cls = jnp.broadcast_to(params["cls_token"].astype(tokens.dtype), (b, 1, cfg.embed_dim))

    pos = params["pos_embed"].astype(tokens.dtype)
    cls_pos = pos[:, :1]  # param layout keeps CLS at row 0 (reference order)
    tile_pos = jnp.tile(pos[:, 1:], (1, cfg.num_frames, 1))
    tile_temporal = jnp.repeat(
        params["temporal_embed"].astype(tokens.dtype), n, axis=1
    )
    patch_pos = (tile_pos + tile_temporal)[:, : f * n]
    return tokens + patch_pos, cls + cls_pos, f


def embed(params: Params, cfg: SpaceTimeViTConfig, video: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    """video (B, F, H, W, C) NHWC → embedded tokens (B, 1+F·N, D) in
    cfg.cls_position token order (fused-stream path)."""
    xp, xc, f = embed_split(params, cfg, video)
    parts = [xc, xp] if cfg.cls_position == "first" else [xp, xc]
    return jnp.concatenate(parts, axis=1), f


def _remat_policy(cfg: SpaceTimeViTConfig):
    """jax.checkpoint policy for the per-block remat (see remat_policy doc).
    'full' → None (save block inputs only, recompute everything else);
    'dots' keeps non-batch matmul outputs resident; 'dots_all' keeps every
    matmul output (batch activations included) and recomputes only VPU ops."""
    if cfg.remat_policy == "dots":
        return jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims
    if cfg.remat_policy == "dots_all":
        return jax.checkpoint_policies.checkpoint_dots
    assert cfg.remat_policy == "full", f"unknown remat_policy {cfg.remat_policy!r}"
    return None


def _sp_constrain(cfg: SpaceTimeViTConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Sequence-parallel activation annotation: (B, T, D) token axis sharded
    over the model mesh axis (no-op without a registered mesh / model axis)."""
    if not cfg.sequence_parallel:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    from oatx.parallel import mesh as meshlib

    mesh = meshlib.current_mesh()
    if mesh is None or mesh.shape.get(meshlib.MODEL_AXIS, 1) <= 1:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(meshlib.DATA_AXIS, meshlib.MODEL_AXIS, None)))


def apply(
    params: Params,
    cfg: SpaceTimeViTConfig,
    video: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Forward. Returns dict with:
      cls     — (B, D) pooled output (per cfg.pooling)
      patches — (B, F·N, D) final-layer patch tokens after final norm
      region  — (B, F·N, D) layer-K patch tokens through region_norm
                 (only when cfg.region_tap_layer is set)
    """
    if (cfg.split_cls_stream and cfg.pipeline_stages == 1
            and not cfg.fused_qkv):
        return _apply_split(params, cfg, video)

    x, f = embed(params, cfg, video)
    x = _sp_constrain(cfg, x)

    block = lambda bp, xx: _sp_constrain(cfg, _block_apply(cfg, bp, xx, f))
    if cfg.remat:
        block = jax.checkpoint(
            lambda bp, xx: _sp_constrain(cfg, _block_apply(cfg, bp, xx, f)),
            policy=_remat_policy(cfg))

    out: Dict[str, jnp.ndarray] = {}
    k = cfg.region_tap_layer
    if cfg.pipeline_stages > 1:
        from oatx.parallel import mesh as meshlib
        from oatx.parallel.pipeline import pipeline_blocks

        assert k is None, "pipeline parallelism does not support region taps"
        mesh = meshlib.current_mesh()
        assert mesh is not None and \
            mesh.shape.get(meshlib.MODEL_AXIS, 1) == cfg.pipeline_stages, (
                "pipeline_stages must equal the registered mesh's model axis")
        x = pipeline_blocks(mesh, block, params["blocks"], x,
                            cfg.pipeline_stages, cfg.pipeline_microbatches)
    elif cfg.scan_blocks:
        def scan_body(xx, bp):
            return block(bp, xx), None

        if k is None:
            x, _ = jax.lax.scan(scan_body, x, params["blocks"])
        else:
            # split the depth scan at K so the tap costs no extra memory
            head = jax.tree_util.tree_map(lambda a: a[:k], params["blocks"])
            tail = jax.tree_util.tree_map(lambda a: a[k:], params["blocks"])
            x, _ = jax.lax.scan(scan_body, x, head)
            out["region"] = layer_norm(params["region_norm"], _patches(cfg, x), LN_EPS)
            x, _ = jax.lax.scan(scan_body, x, tail)
    else:
        for i in range(cfg.depth):
            bp = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
            x = block(bp, x)
            if k is not None and i == k - 1:
                out["region"] = layer_norm(params["region_norm"], _patches(cfg, x), LN_EPS)

    x = layer_norm(params["norm"], x, LN_EPS)
    if cfg.cls_position == "first":
        cls, patches = x[:, 0], x[:, 1:]
    else:
        cls, patches = x[:, -1], x[:, :-1]
    if cfg.pooling == "cls":
        pooled = cls
    elif cfg.pooling == "cls_mean_half":
        # global-local variant (oa_video_transformer_global_local.py:356)
        pooled = 0.5 * cls + 0.5 * jnp.mean(patches, axis=1)
    else:
        raise ValueError(f"unknown pooling {cfg.pooling!r}")
    out["cls"] = pooled
    out["patches"] = patches
    return out


def _apply_split(
    params: Params, cfg: SpaceTimeViTConfig, video: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """apply() over the split (patches, CLS) residual stream — same outputs.

    Used when cfg.split_cls_stream is set and no fused-stream-only feature
    (pipeline parallelism, fused_qkv) is active. Sequence parallelism
    constrains the patch stream's token axis exactly as the fused path does;
    the (B, 1, D) CLS stream follows batch sharding."""
    xp, xc, f = embed_split(params, cfg, video)
    xp = _sp_constrain(cfg, xp)

    def block(bp, sp, sc):
        rp, rc = _block_apply_split(cfg, bp, sp, sc, f)
        return _sp_constrain(cfg, rp), rc

    if cfg.remat:
        block = jax.checkpoint(block, policy=_remat_policy(cfg))

    out: Dict[str, jnp.ndarray] = {}
    k = cfg.region_tap_layer
    if cfg.scan_blocks:
        def scan_body(carry, bp):
            return block(bp, *carry), None

        if k is None:
            (xp, xc), _ = jax.lax.scan(scan_body, (xp, xc), params["blocks"])
        else:
            head = jax.tree_util.tree_map(lambda a: a[:k], params["blocks"])
            tail = jax.tree_util.tree_map(lambda a: a[k:], params["blocks"])
            (xp, xc), _ = jax.lax.scan(scan_body, (xp, xc), head)
            out["region"] = layer_norm(params["region_norm"], xp, LN_EPS)
            (xp, xc), _ = jax.lax.scan(scan_body, (xp, xc), tail)
    else:
        for i in range(cfg.depth):
            bp = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
            xp, xc = block(bp, xp, xc)
            if k is not None and i == k - 1:
                out["region"] = layer_norm(params["region_norm"], xp, LN_EPS)

    cls = layer_norm(params["norm"], xc, LN_EPS)[:, 0]
    patches = layer_norm(params["norm"], xp, LN_EPS)
    if cfg.pooling == "cls":
        pooled = cls
    elif cfg.pooling == "cls_mean_half":
        pooled = 0.5 * cls + 0.5 * jnp.mean(patches, axis=1)
    else:
        raise ValueError(f"unknown pooling {cfg.pooling!r}")
    out["cls"] = pooled
    out["patches"] = patches
    return out


def inflate_spatial_embed(pos_embed: jnp.ndarray, target_patches: int) -> jnp.ndarray:
    """Spatial positional-embedding resize when patch counts differ — bilinear
    interpolation of the (g, g) grid, CLS slot preserved. The reference leaves
    this unimplemented (model.py:153-159 raises); oatx supports it so lower/
    higher-resolution finetunes can import checkpoints."""
    n = pos_embed.shape[1] - 1
    if n == target_patches:
        return pos_embed
    g_src = int(round(n ** 0.5))
    g_dst = int(round(target_patches ** 0.5))
    assert g_src * g_src == n and g_dst * g_dst == target_patches, \
        f"non-square patch grids: {n} → {target_patches}"
    cls, grid = pos_embed[:, :1], pos_embed[:, 1:]
    grid = grid.reshape(1, g_src, g_src, -1)
    grid = jax.image.resize(grid, (1, g_dst, g_dst, grid.shape[-1]), method="bilinear")
    return jnp.concatenate([cls, grid.reshape(1, target_patches, -1)], axis=1)


def inflate_temporal_embed(
    temporal_embed: jnp.ndarray, target_frames: int, mode: str = "zeros"
) -> jnp.ndarray:
    """Temporal positional-embedding inflation when checkpoint frame count differs
    (reference model.py:119-150 _inflate_positional_embeds).

    modes: 'zeros' (pad with zeros), 'interp' (nearest), 'bilinear' (linear).
    Shrinking always truncates.
    """
    src = temporal_embed
    load_frames = src.shape[1]
    if load_frames == target_frames:
        return src
    if load_frames > target_frames:
        return src[:, :target_frames]
    if mode == "zeros":
        pad = jnp.zeros((src.shape[0], target_frames - load_frames, src.shape[2]), src.dtype)
        return jnp.concatenate([src, pad], axis=1)
    if mode in ("interp", "bilinear"):
        method = "nearest" if mode == "interp" else "linear"
        return jax.image.resize(
            src, (src.shape[0], target_frames, src.shape[2]), method=method
        )
    raise NotImplementedError(f"temporal fix mode {mode!r}")
