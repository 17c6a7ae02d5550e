"""PyTorch checkpoint → oatx parameter-tree converters.

Checkpoint-compatibility layer reproducing the reference's loading behavior:
  * `module.` DataParallel prefix stripping (reference utils/util.py:24-50);
  * timm-ViT → SpaceTimeTransformer overlay with strict=False semantics — keys
    absent from the source keep their fresh-init values (reference model.py:44-50);
  * temporal positional-embedding inflation on frame-count mismatch
    (reference model.py:119-150) — see vit_spacetime.inflate_temporal_embed;
  * HF DistilBERT state_dict import;
  * full FrozenInTime dual-tower `.pth` import (video_model.* / text_model.* /
    vid_proj.* / txt_proj.*).

All converters take a dict[str, np.ndarray] (use load_torch_checkpoint to read a
.pth on the host) and return jnp param trees matching the oatx model inits.
Layout changes: torch Linear weight (out,in) → kernel (in,out); torch Conv2d OIHW →
HWIO.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from oatx.core.module import Params, stack_params
from oatx.models import distilbert as dbert
from oatx.models import vit_spacetime as vst


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch .pth/.pth.tar into numpy (host-side; requires torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in ckpt.items()}


def strip_data_parallel_prefix(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Remove a leading 'module.' from every key if present."""
    if not any(k.startswith("module.") for k in state_dict):
        return dict(state_dict)
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in state_dict.items()}


def _t(w: np.ndarray) -> jnp.ndarray:
    """torch Linear weight (out, in) → jax kernel (in, out)."""
    return jnp.asarray(np.ascontiguousarray(w.T))


def _dense(sd: Dict[str, np.ndarray], prefix: str) -> Params:
    return {"kernel": _t(sd[f"{prefix}.weight"]), "bias": jnp.asarray(sd[f"{prefix}.bias"])}


def _ln(sd: Dict[str, np.ndarray], prefix: str) -> Params:
    return {"scale": jnp.asarray(sd[f"{prefix}.weight"]), "bias": jnp.asarray(sd[f"{prefix}.bias"])}


# ---------------------------------------------------------------- DistilBERT

def distilbert_from_torch(
    state_dict: Dict[str, np.ndarray], cfg: Optional[dbert.DistilBertConfig] = None
) -> Params:
    """HF DistilBertModel state_dict → oatx.models.distilbert param tree.

    Accepts bare ('embeddings...') or prefixed ('distilbert.embeddings...',
    'text_model.embeddings...') key styles.
    """
    cfg = cfg or dbert.DistilBertConfig()
    sd = strip_data_parallel_prefix(state_dict)
    for pfx in ("distilbert.", "text_model."):
        if any(k.startswith(pfx + "embeddings") for k in sd):
            sd = {k[len(pfx):]: v for k, v in sd.items() if k.startswith(pfx)}
            break

    layers = []
    for i in range(cfg.n_layers):
        p = f"transformer.layer.{i}"
        layers.append({
            "attn": {
                "q": _dense(sd, f"{p}.attention.q_lin"),
                "k": _dense(sd, f"{p}.attention.k_lin"),
                "v": _dense(sd, f"{p}.attention.v_lin"),
                "out": _dense(sd, f"{p}.attention.out_lin"),
            },
            "sa_ln": _ln(sd, f"{p}.sa_layer_norm"),
            "ffn": {"lin1": _dense(sd, f"{p}.ffn.lin1"), "lin2": _dense(sd, f"{p}.ffn.lin2")},
            "out_ln": _ln(sd, f"{p}.output_layer_norm"),
        })
    return {
        "embeddings": {
            "word": jnp.asarray(sd["embeddings.word_embeddings.weight"]),
            "position": jnp.asarray(sd["embeddings.position_embeddings.weight"]),
            "ln": _ln(sd, "embeddings.LayerNorm"),
        },
        "layers": stack_params(layers),
    }


# ----------------------------------------------------- SpaceTimeTransformer

def _attn_params(sd: Dict[str, np.ndarray], prefix: str) -> Params:
    return {"qkv": _dense(sd, f"{prefix}.qkv"), "proj": _dense(sd, f"{prefix}.proj")}


def spacetime_vit_overlay_torch(
    params: Params,
    state_dict: Dict[str, np.ndarray],
    cfg: vst.SpaceTimeViTConfig,
    temporal_fix: str = "zeros",
    prefix: str = "",
) -> Params:
    """Overlay torch SpaceTimeTransformer/timm-ViT weights onto fresh init params.

    strict=False semantics: any key missing from the source keeps its init value
    (e.g. a plain timm ViT has no timeattn/norm3/temporal_embed — time attention
    stays zero-initialized, exactly like the reference's ViT inflation).
    """
    sd = strip_data_parallel_prefix(state_dict)
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    out = dict(params)
    if "patch_embed.proj.weight" in sd:
        w = sd["patch_embed.proj.weight"]  # (O, I, kh, kw) → (kh, kw, I, O)
        out["patch_embed"] = {
            "kernel": jnp.asarray(np.ascontiguousarray(w.transpose(2, 3, 1, 0))),
            "bias": jnp.asarray(sd["patch_embed.proj.bias"]),
        }
    if "cls_token" in sd:
        out["cls_token"] = jnp.asarray(sd["cls_token"])
    if "pos_embed" in sd:
        # spatial grid resize supported (the reference raises here, model.py:153-159)
        out["pos_embed"] = vst.inflate_spatial_embed(
            jnp.asarray(sd["pos_embed"]), cfg.patches_per_frame)
    if "temporal_embed" in sd:
        out["temporal_embed"] = vst.inflate_temporal_embed(
            jnp.asarray(sd["temporal_embed"]), cfg.num_frames, temporal_fix
        )
    if "norm.weight" in sd:
        out["norm"] = _ln(sd, "norm")
    if cfg.region_tap_layer is not None and "region_norm.weight" in sd:
        out["region_norm"] = _ln(sd, "region_norm")

    blocks = []
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        # start from the fresh-init slice of layer i (strict=False fallback)
        b: Params = jax.tree_util.tree_map(lambda x: x[i], params["blocks"])
        if f"{p}.norm1.weight" in sd:
            b["norm1"] = _ln(sd, f"{p}.norm1")
            b["norm2"] = _ln(sd, f"{p}.norm2")
            b["attn"] = _attn_params(sd, f"{p}.attn")
            b["mlp"] = {
                "fc1": _dense(sd, f"{p}.mlp.fc1"),
                "fc2": _dense(sd, f"{p}.mlp.fc2"),
            }
        if f"{p}.norm3.weight" in sd:
            b["norm3"] = _ln(sd, f"{p}.norm3")
        if f"{p}.timeattn.qkv.weight" in sd:
            b["timeattn"] = _attn_params(sd, f"{p}.timeattn")
        blocks.append(b)
    out["blocks"] = stack_params(blocks)
    return out


# ------------------------------------------------------------ full dual tower

def frozen_in_time_from_torch(
    state_dict: Dict[str, np.ndarray],
    video_cfg: vst.SpaceTimeViTConfig,
    text_cfg: Optional[Any] = None,
    fresh_video_params: Optional[Params] = None,
    temporal_fix: str = "zeros",
    text_family: str = "distilbert",
) -> Params:
    """Full reference checkpoint (video_model.* + text_model.* + projections) →
    oatx dual-tower param tree {video, text, vid_proj, txt_proj}."""
    sd = strip_data_parallel_prefix(state_dict)

    import jax.random as jr

    fresh = fresh_video_params
    if fresh is None:
        fresh = vst.init(jr.PRNGKey(0), video_cfg)
    video = spacetime_vit_overlay_torch(
        fresh, sd, video_cfg, temporal_fix=temporal_fix, prefix="video_model."
    )
    if text_family == "bert":
        from oatx.models.bert import BertConfig, bert_from_torch

        text = bert_from_torch(sd, text_cfg or BertConfig())
    else:
        text = distilbert_from_torch(sd, text_cfg or dbert.DistilBertConfig())
    out: Params = {"video": video, "text": text}
    # projection heads: txt_proj = Sequential(ReLU, Linear) → index 1;
    # vid_proj = Sequential(Linear) → index 0 (reference model.py:59-65)
    if "txt_proj.1.weight" in sd:
        out["txt_proj"] = _dense(sd, "txt_proj.1")
    if "vid_proj.0.weight" in sd:
        out["vid_proj"] = _dense(sd, "vid_proj.0")
    if "txt_proj_2.weight" in sd:  # region-memory variant CLIP projection
        out["txt_proj_2"] = _dense(sd, "txt_proj_2")
    return out
