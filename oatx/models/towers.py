"""Dual-tower video-text models (FrozenInTime equivalent + object-aware variants).

Reference parity:
  * baseline       — /root/reference/OATrans/model/model.py:10-161 (FrozenInTime):
                     DistilBERT CLS → txt_proj(ReLU, Linear 768→256);
                     SpaceTime ViT CLS → vid_proj(Linear 768→256).
  * global_local   — oa_model_global_local.py:149-222: two text streams (caption and
                     caption+object-tags "pad_text"), text embed = CLS + mean(tokens),
                     video input is 2× interleaved (object frame, clip frames),
                     patch-mask-pooled region features and tag-token-pooled text
                     features through separate local projection heads.
  * region_mem     — oa_model_region_mem.py:18-163: region features tapped at layer
                     K=6 through region_norm, video embed = ½·cls + ½·mean(region),
                     CLIP text-region memory rows through txt_proj_2 (512→256),
                     region_sim = sigmoid(text_region · patch_region^T).

Dead reference paths (CrossModalityFusion / ObjectTransformer / two_outputs joint
projection — oa_model_global_local.py:36-44,143, broken symbols) are intentionally
not reproduced; see SURVEY.md §7 "Reference bit-rot".

All forwards are pure functions over a params pytree — jit/pjit them whole.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from oatx.core.module import Params, trunc_normal
from oatx.models import distilbert as dbert
from oatx.models import vit_spacetime as vst
from oatx.ops.layers import linear


@dataclasses.dataclass(frozen=True)
class TowerConfig:
    video: vst.SpaceTimeViTConfig = dataclasses.field(default_factory=vst.SpaceTimeViTConfig)
    text: Any = dataclasses.field(default_factory=dbert.DistilBertConfig)
    text_family: str = "distilbert"    # 'distilbert' (CLS) | 'bert' (pooler)
    projection_dim: int = 256
    projection: str = "minimal"        # 'minimal' | '' (identity)
    variant: str = "baseline"          # 'baseline' | 'global_local' | 'region_mem'
    region_embed_dim: int = 512        # CLIP text dim for region memory rows
    compute_dtype: Any = jnp.float32   # bf16 on TPU
    object_tower: Optional[Any] = None  # ObjectTowerConfig → enables the
    # object-feature branch (compute_object / o2v / o2t streams). The reference
    # names this branch (oa_model.py:125-127, arch.stream == 3) but its
    # object_model is never assigned upstream — see models/object_tower.py.

    def __post_init__(self):
        if self.variant == "region_mem" and self.video.region_tap_layer is None:
            object.__setattr__(
                self, "video",
                dataclasses.replace(self.video, region_tap_layer=6),
            )
        if self.variant == "global_local" and self.video.pooling != "cls_mean_half":
            object.__setattr__(
                self, "video",
                dataclasses.replace(self.video, pooling="cls_mean_half"),
            )


def _proj_init(rng: jax.Array, d_in: int, d_out: int) -> Params:
    return {"kernel": trunc_normal(rng, (d_in, d_out)), "bias": jnp.zeros((d_out,))}


def _text_out_dim(cfg: TowerConfig) -> int:
    """Width of the pooled text feature feeding txt_proj: hidden dim for the
    (distil)bert towers, the CLIP projection's embed_dim for the clip tower."""
    if cfg.text_family == "clip":
        return cfg.text.embed_dim
    return cfg.text.dim


def init(rng: jax.Array, cfg: TowerConfig) -> Params:
    rs = jax.random.split(rng, 8)
    if cfg.text_family == "bert":
        from oatx.models import bert as bert_mod

        text_params = bert_mod.init(rs[1], cfg.text)
    elif cfg.text_family == "clip":
        from oatx.models import clip_text as ct

        if cfg.variant == "global_local":
            # global_local needs per-token hidden features in the text width;
            # the CLIP tower pools through its projection — not wired up
            raise NotImplementedError(
                "text_family='clip' supports variants 'baseline'/'region_mem'")
        text_params = ct.init(rs[1], cfg.text)
    else:
        text_params = dbert.init(rs[1], cfg.text)
    params: Params = {
        "video": vst.init(rs[0], cfg.video),
        "text": text_params,
    }
    if cfg.projection == "minimal":
        params["txt_proj"] = _proj_init(rs[2], _text_out_dim(cfg), cfg.projection_dim)
        params["vid_proj"] = _proj_init(rs[3], cfg.video.embed_dim, cfg.projection_dim)
        if cfg.variant == "global_local":
            params["txt_local_proj"] = _proj_init(rs[4], cfg.text.dim, cfg.projection_dim)
            params["vid_local_proj"] = _proj_init(rs[5], cfg.video.embed_dim, cfg.projection_dim)
        if cfg.variant == "region_mem":
            params["txt_proj_2"] = _proj_init(rs[6], cfg.region_embed_dim, cfg.projection_dim)
    elif cfg.projection != "":
        raise NotImplementedError(f"projection {cfg.projection!r}")
    if cfg.object_tower is not None:
        from oatx.models import object_tower as objt

        r_obj = jax.random.split(rs[7], 2)
        params["object_tower"] = objt.init(r_obj[0], cfg.object_tower)
        params["obj_proj"] = _proj_init(r_obj[1], cfg.object_tower.dim,
                                        cfg.projection_dim)
    return params


def _txt_proj(params: Params, cfg: TowerConfig, x: jnp.ndarray) -> jnp.ndarray:
    """ReLU → Linear (reference 'minimal' txt_proj, model.py:59-61)."""
    if cfg.projection == "":
        return x
    return linear(params["txt_proj"], jax.nn.relu(x))


def _vid_proj(params: Params, cfg: TowerConfig, x: jnp.ndarray) -> jnp.ndarray:
    if cfg.projection == "":
        return x
    return linear(params["vid_proj"], x)


def compute_text(
    params: Params, cfg: TowerConfig, input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    return_tokens: bool = False,
):
    """Text embedding (B, proj_dim); optionally also the full token features.

    distilbert → CLS hidden state; bert → tanh pooler output (reference
    model.py:104-110 dispatch); clip → EOT-pooled @ text_projection
    (oatx first-party tower, models/clip_text.py — causal mask, so
    attention_mask is unused)."""
    with jax.named_scope("text_tower"):
        return _compute_text(params, cfg, input_ids, attention_mask,
                             return_tokens)


def _compute_text(params, cfg, input_ids, attention_mask, return_tokens):
    if cfg.text_family == "clip":
        from oatx.models import clip_text as ct

        pooled = ct.encode_text(params["text"], cfg.text, input_ids,
                                dtype=cfg.compute_dtype)
        emb = _txt_proj(params, cfg, pooled.astype(jnp.float32))
        if return_tokens:
            return emb, ct.encode_text_tokens(params["text"], cfg.text,
                                              input_ids, dtype=cfg.compute_dtype)
        return emb
    if cfg.text_family == "bert":
        from oatx.models import bert as bert_mod

        hidden, pooled = bert_mod.apply(params["text"], cfg.text, input_ids,
                                        attention_mask, dtype=cfg.compute_dtype)
        pooled = pooled.astype(cfg.compute_dtype)
    else:
        hidden = dbert.apply(params["text"], cfg.text, input_ids, attention_mask,
                             dtype=cfg.compute_dtype)
        pooled = hidden[:, 0]
    if cfg.variant == "global_local":
        # CLS + mean of the remaining tokens (oa_model_global_local.py:217)
        pooled = hidden[:, 0] + jnp.mean(hidden[:, 1:], axis=1)
    emb = _txt_proj(params, cfg, pooled.astype(jnp.float32))
    if return_tokens:
        return emb, hidden
    return emb


def compute_video(params: Params, cfg: TowerConfig, video: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Video tower forward → dict(cls=(B,D_proj), patches/region as configured)."""
    with jax.named_scope("video_tower"):
        out = vst.apply(params["video"], cfg.video, video.astype(cfg.compute_dtype))
        res = {"cls": _vid_proj(params, cfg, out["cls"].astype(jnp.float32))}
    if "patches" in out:
        res["patches"] = out["patches"]
    if "region" in out:
        res["region"] = out["region"]
    return res


def compute_object(params: Params, cfg: TowerConfig,
                   objects: jnp.ndarray) -> jnp.ndarray:
    """Object-feature embedding (B, proj_dim) from (B, K, 2054) BUTD features.

    Working equivalent of the reference's broken compute_object
    (oa_model.py:125-127 — its object_model attribute is never assigned); the
    encoder design is oatx's (models/object_tower.py)."""
    from oatx.models import object_tower as objt

    assert cfg.object_tower is not None, "object tower not configured"
    pooled = objt.apply(params["object_tower"], cfg.object_tower, objects,
                        dtype=cfg.compute_dtype)
    return linear(params["obj_proj"], pooled.astype(jnp.float32))


def forward_baseline(
    params: Params, cfg: TowerConfig, batch: Dict[str, jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(text_embeds, video_embeds) — reference FrozenInTime.forward."""
    text_embeds = compute_text(params, cfg, batch["input_ids"], batch.get("attention_mask"))
    video_embeds = compute_video(params, cfg, batch["video"])["cls"]
    return text_embeds, video_embeds


def tag_token_masks(
    text_lens: jnp.ndarray, tag_end_offsets: jnp.ndarray, seq_len: int
) -> jnp.ndarray:
    """Per-object masks over the pad_text token sequence.

    pad_text = caption ⊕ object tags; object k's tag tokens occupy positions
    [text_len-1+end_{k-1}, text_len-1+end_k) (reference
    oa_model_global_local.py:189-196 — the -1 accounts for the caption's [SEP]).

    text_lens: (B,) caption token counts; tag_end_offsets: (B, O) cumulative token
    end offsets per object; → (B, O, seq_len) float mask. Fully vectorized and
    jittable (the reference builds this with a Python double loop on device).
    """
    b, o = tag_end_offsets.shape
    pos = jnp.arange(seq_len)[None, None, :]                        # (1,1,L)
    ends = tag_end_offsets.astype(jnp.int32)                        # (B,O)
    starts = jnp.concatenate([jnp.zeros((b, 1), jnp.int32), ends[:, :-1]], axis=1)
    base = (text_lens.astype(jnp.int32) - 1)[:, None, None]         # (B,1,1)
    lo = base + starts[:, :, None]
    hi = base + ends[:, :, None]
    return ((pos >= lo) & (pos < hi)).astype(jnp.float32)


def forward_global_local(
    params: Params, cfg: TowerConfig, batch: Dict[str, jnp.ndarray]
) -> Dict[str, jnp.ndarray]:
    """Global-local OA forward (oa_model_global_local.py:149-208).

    batch keys: input_ids/attention_mask (caption), pad_input_ids/pad_attention_mask
    (caption+tags), video (B, F, H, W, C), object_frame (B, 1, H, W, C),
    patch_masks (B, O, N_frame) over the object frame's patches,
    object_token_masks (B, O) cumulative tag-token ends.

    NOTE: the reference prepends the object frame to the clip tensor and splits it
    back with a view(B·2, F/2) reshape (oa_model_global_local.py:155-159), which
    only round-trips for even frame counts and leaks clip frames into the "object"
    stream. oatx keeps the two streams explicit — the object frame goes through the
    shared tower as a 1-frame image (the F=1 degenerate path used for CC3M).
    """
    text_embeds, text_tokens = compute_text(
        params, cfg, batch["input_ids"], batch.get("attention_mask"), return_tokens=True)
    pad_text_embeds, pad_text_tokens = compute_text(
        params, cfg, batch["pad_input_ids"], batch.get("pad_attention_mask"), return_tokens=True)

    vout = compute_video(params, cfg, batch["video"])
    oout = compute_video(params, cfg, batch["object_frame"])
    video_embeds = vout["cls"]
    object_img_embeds, object_region = oout["cls"], oout["patches"]

    # patch-mask pooling of object-frame regions (sum over patches; reference einsum)
    patch_masks = batch["patch_masks"].astype(object_region.dtype)   # (B, O, N)
    region_feat = jnp.einsum("bol,blc->boc", patch_masks, object_region)
    # tag-token pooling over pad_text tokens
    text_lens = jnp.sum(batch["attention_mask"], axis=1)
    tmask = tag_token_masks(text_lens, batch["object_token_masks"],
                            pad_text_tokens.shape[1]).astype(pad_text_tokens.dtype)
    tags_feat = jnp.einsum("bol,blc->boc", tmask, pad_text_tokens)

    region_feat = linear(params["vid_local_proj"], region_feat.astype(jnp.float32))
    tags_feat = linear(params["txt_local_proj"], jax.nn.relu(tags_feat.astype(jnp.float32)))
    return {
        "text_embeds": text_embeds,
        "pad_text_embeds": pad_text_embeds,
        "video_embeds": video_embeds,
        "object_img_embeds": object_img_embeds,
        "region_feat": region_feat,
        "tags_feat": tags_feat,
    }


def forward_region_mem(
    params: Params, cfg: TowerConfig, batch: Dict[str, jnp.ndarray]
) -> Dict[str, jnp.ndarray]:
    """Region-memory forward (oa_model_region_mem.py:105-151).

    batch keys: input_ids/attention_mask, video (B, F, ...), object_frame
    (B, 1, ...), text_region_embedding (B, K, region_embed_dim) CLIP memory rows.
    Returns text/video embeds and region_sim *logits* (B, K, N) — apply sigmoid for
    probabilities; the BCE loss uses the logits directly for stability. (Object
    frame as an explicit stream — see forward_global_local note.)
    """
    text_embeds = compute_text(params, cfg, batch["input_ids"], batch.get("attention_mask"))

    vout = compute_video(params, cfg, batch["video"])
    oout = compute_video(params, cfg, batch["object_frame"])
    # region features: layer-K tap through region_norm, then the SHARED vid_proj
    object_region = linear(params["vid_proj"], oout["region"].astype(jnp.float32))
    video_region = linear(params["vid_proj"], vout["region"].astype(jnp.float32))
    video_embeds = (vout["cls"] + jnp.mean(video_region, axis=1)) / 2.0

    # reference txt_proj_2 is Sequential(ReLU, Linear(512→256)) — the ReLU on the
    # raw CLIP rows matters numerically (oa_model_region_mem.py:70-72)
    text_region = linear(params["txt_proj_2"],
                         jax.nn.relu(batch["text_region_embedding"].astype(jnp.float32)))
    region_sim_logits = jnp.einsum("bkf,bnf->bkn", text_region, object_region,
                                   preferred_element_type=jnp.float32)
    return {
        "text_embeds": text_embeds,
        "video_embeds": video_embeds,
        "region_sim_logits": region_sim_logits,
    }


def forward(params: Params, cfg: TowerConfig, batch: Dict[str, jnp.ndarray]):
    if cfg.variant == "baseline":
        return forward_baseline(params, cfg, batch)
    if cfg.variant == "global_local":
        return forward_global_local(params, cfg, batch)
    if cfg.variant == "region_mem":
        return forward_region_mem(params, cfg, batch)
    raise ValueError(f"unknown variant {cfg.variant!r}")
