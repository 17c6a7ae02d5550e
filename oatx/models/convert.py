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
    elif text_family == "clip":
        text, _ = clip_text_from_torch(sd)
    else:
        text = distilbert_from_torch(sd, text_cfg or dbert.DistilBertConfig())
    out: Params = {"video": video, "text": text}
    # projection heads: txt_proj = Sequential(ReLU, Linear) → index 1;
    # vid_proj = Sequential(Linear) → index 0 (reference model.py:59-65)
    if "txt_proj.1.weight" in sd:
        out["txt_proj"] = _dense(sd, "txt_proj.1")
    if "vid_proj.0.weight" in sd:
        out["vid_proj"] = _dense(sd, "vid_proj.0")
    # region-memory CLIP projection: Sequential(ReLU, Linear) → index 1
    # (oa_model_region_mem.py:70-72)
    if "txt_proj_2.1.weight" in sd:
        out["txt_proj_2"] = _dense(sd, "txt_proj_2.1")
    # global-local fine-grained heads: text_local_proj = Sequential(ReLU, Linear),
    # vid_local_proj = Sequential(Linear) (oa_model_global_local.py:100-135)
    if "text_local_proj.1.weight" in sd:
        out["txt_local_proj"] = _dense(sd, "text_local_proj.1")
    if "vid_local_proj.0.weight" in sd:
        out["vid_local_proj"] = _dense(sd, "vid_local_proj.0")
    return out


# ------------------------------------------------------------ export to torch

def _t_out(kernel) -> np.ndarray:
    """jax kernel (in, out) → torch Linear weight (out, in)."""
    return np.ascontiguousarray(np.asarray(kernel).T)


def _export_distilbert_text(sd: Dict[str, np.ndarray], t: Params) -> None:
    """Inverse of distilbert_from_torch: HF DistilBertModel key schema under
    the reference's 'text_model.' prefix (model.py:30-40 instantiates
    AutoModel 'distilbert-base-uncased' as self.text_model)."""
    sd["text_model.embeddings.word_embeddings.weight"] = np.asarray(t["embeddings"]["word"])
    sd["text_model.embeddings.position_embeddings.weight"] = np.asarray(t["embeddings"]["position"])
    sd["text_model.embeddings.LayerNorm.weight"] = np.asarray(t["embeddings"]["ln"]["scale"])
    sd["text_model.embeddings.LayerNorm.bias"] = np.asarray(t["embeddings"]["ln"]["bias"])
    n_layers = t["layers"]["sa_ln"]["scale"].shape[0]
    for i in range(n_layers):
        lp = jax.tree_util.tree_map(lambda a: a[i], t["layers"])
        p = f"text_model.transformer.layer.{i}"
        for src, dst in (("q", "q_lin"), ("k", "k_lin"), ("v", "v_lin"), ("out", "out_lin")):
            sd[f"{p}.attention.{dst}.weight"] = _t_out(lp["attn"][src]["kernel"])
            sd[f"{p}.attention.{dst}.bias"] = np.asarray(lp["attn"][src]["bias"])
        sd[f"{p}.sa_layer_norm.weight"] = np.asarray(lp["sa_ln"]["scale"])
        sd[f"{p}.sa_layer_norm.bias"] = np.asarray(lp["sa_ln"]["bias"])
        sd[f"{p}.ffn.lin1.weight"] = _t_out(lp["ffn"]["lin1"]["kernel"])
        sd[f"{p}.ffn.lin1.bias"] = np.asarray(lp["ffn"]["lin1"]["bias"])
        sd[f"{p}.ffn.lin2.weight"] = _t_out(lp["ffn"]["lin2"]["kernel"])
        sd[f"{p}.ffn.lin2.bias"] = np.asarray(lp["ffn"]["lin2"]["bias"])
        sd[f"{p}.output_layer_norm.weight"] = np.asarray(lp["out_ln"]["scale"])
        sd[f"{p}.output_layer_norm.bias"] = np.asarray(lp["out_ln"]["bias"])


def _export_bert_text(sd: Dict[str, np.ndarray], t: Params) -> None:
    """Inverse of bert.bert_from_torch: HF BertModel key schema under
    'text_model.' (the reference accepts text_params.model='bert-base-uncased',
    model.py:30-40; pooler output pooled at model.py:106-108)."""
    e = t["embeddings"]
    sd["text_model.embeddings.word_embeddings.weight"] = np.asarray(e["word"])
    sd["text_model.embeddings.position_embeddings.weight"] = np.asarray(e["position"])
    sd["text_model.embeddings.token_type_embeddings.weight"] = np.asarray(e["token_type"])
    sd["text_model.embeddings.LayerNorm.weight"] = np.asarray(e["ln"]["scale"])
    sd["text_model.embeddings.LayerNorm.bias"] = np.asarray(e["ln"]["bias"])
    n_layers = t["layers"]["attn_ln"]["scale"].shape[0]
    for i in range(n_layers):
        lp = jax.tree_util.tree_map(lambda a: a[i], t["layers"])
        p = f"text_model.encoder.layer.{i}"
        for src, dst in (("q", "attention.self.query"), ("k", "attention.self.key"),
                         ("v", "attention.self.value"), ("out", "attention.output.dense")):
            sd[f"{p}.{dst}.weight"] = _t_out(lp["attn"][src]["kernel"])
            sd[f"{p}.{dst}.bias"] = np.asarray(lp["attn"][src]["bias"])
        sd[f"{p}.attention.output.LayerNorm.weight"] = np.asarray(lp["attn_ln"]["scale"])
        sd[f"{p}.attention.output.LayerNorm.bias"] = np.asarray(lp["attn_ln"]["bias"])
        sd[f"{p}.intermediate.dense.weight"] = _t_out(lp["intermediate"]["kernel"])
        sd[f"{p}.intermediate.dense.bias"] = np.asarray(lp["intermediate"]["bias"])
        sd[f"{p}.output.dense.weight"] = _t_out(lp["output"]["kernel"])
        sd[f"{p}.output.dense.bias"] = np.asarray(lp["output"]["bias"])
        sd[f"{p}.output.LayerNorm.weight"] = np.asarray(lp["out_ln"]["scale"])
        sd[f"{p}.output.LayerNorm.bias"] = np.asarray(lp["out_ln"]["bias"])
    sd["text_model.pooler.dense.weight"] = _t_out(t["pooler"]["kernel"])
    sd["text_model.pooler.dense.bias"] = np.asarray(t["pooler"]["bias"])


def _export_clip_text(sd: Dict[str, np.ndarray], t: Params, prefix: str = "") -> None:
    """Inverse of clip_text_from_torch: vendored-CLIP text-side key schema
    (Visualization/.../clip/model.py:222-249 — token_embedding /
    positional_embedding / transformer.resblocks.* / ln_final /
    text_projection). prefix='' yields bare keys loadable straight into the
    vendored CLIP module (strict=False for the visual half)."""
    sd[f"{prefix}token_embedding.weight"] = np.asarray(t["token_embedding"])
    sd[f"{prefix}positional_embedding"] = np.asarray(t["positional_embedding"])
    n_layers = t["blocks"]["ln_1"]["scale"].shape[0]
    for i in range(n_layers):
        bp = jax.tree_util.tree_map(lambda a: a[i], t["blocks"])
        p = f"{prefix}transformer.resblocks.{i}"
        for ln in ("ln_1", "ln_2"):
            sd[f"{p}.{ln}.weight"] = np.asarray(bp[ln]["scale"])
            sd[f"{p}.{ln}.bias"] = np.asarray(bp[ln]["bias"])
        sd[f"{p}.attn.in_proj_weight"] = _t_out(bp["attn"]["qkv"]["kernel"])
        sd[f"{p}.attn.in_proj_bias"] = np.asarray(bp["attn"]["qkv"]["bias"])
        sd[f"{p}.attn.out_proj.weight"] = _t_out(bp["attn"]["out"]["kernel"])
        sd[f"{p}.attn.out_proj.bias"] = np.asarray(bp["attn"]["out"]["bias"])
        sd[f"{p}.mlp.c_fc.weight"] = _t_out(bp["mlp"]["fc1"]["kernel"])
        sd[f"{p}.mlp.c_fc.bias"] = np.asarray(bp["mlp"]["fc1"]["bias"])
        sd[f"{p}.mlp.c_proj.weight"] = _t_out(bp["mlp"]["fc2"]["kernel"])
        sd[f"{p}.mlp.c_proj.bias"] = np.asarray(bp["mlp"]["fc2"]["bias"])
    sd[f"{prefix}ln_final.weight"] = np.asarray(t["ln_final"]["scale"])
    sd[f"{prefix}ln_final.bias"] = np.asarray(t["ln_final"]["bias"])
    # text_projection is a raw Parameter used as x @ W — exported untransposed
    sd[f"{prefix}text_projection"] = np.asarray(t["text_projection"])


def clip_text_to_torch(params: Params) -> Dict[str, np.ndarray]:
    """oatx clip_text param tree → bare vendored-CLIP text-side state_dict
    (round-trips with clip_text_from_torch)."""
    sd: Dict[str, np.ndarray] = {}
    _export_clip_text(sd, params, prefix="")
    return sd


def frozen_in_time_to_torch(
    params: Params, video_cfg: vst.SpaceTimeViTConfig, text_family: str = "distilbert"
) -> Dict[str, np.ndarray]:
    """oatx dual-tower params → a reference-style FrozenInTime state_dict
    (video_model.* / text_model.* / txt_proj.1 / vid_proj.0), so oatx-trained
    weights drop into torch eval harnesses built for the reference. Round-trips
    with frozen_in_time_from_torch (tested)."""
    sd: Dict[str, np.ndarray] = {}

    v = params["video"]
    sd["video_model.patch_embed.proj.weight"] = np.ascontiguousarray(
        np.asarray(v["patch_embed"]["kernel"]).transpose(3, 2, 0, 1))
    sd["video_model.patch_embed.proj.bias"] = np.asarray(v["patch_embed"]["bias"])
    sd["video_model.cls_token"] = np.asarray(v["cls_token"])
    sd["video_model.pos_embed"] = np.asarray(v["pos_embed"])
    sd["video_model.temporal_embed"] = np.asarray(v["temporal_embed"])
    sd["video_model.norm.weight"] = np.asarray(v["norm"]["scale"])
    sd["video_model.norm.bias"] = np.asarray(v["norm"]["bias"])
    if "region_norm" in v:
        sd["video_model.region_norm.weight"] = np.asarray(v["region_norm"]["scale"])
        sd["video_model.region_norm.bias"] = np.asarray(v["region_norm"]["bias"])
    for i in range(video_cfg.depth):
        bp = jax.tree_util.tree_map(lambda a: a[i], v["blocks"])
        p = f"video_model.blocks.{i}"
        for ln in ("norm1", "norm2", "norm3"):
            sd[f"{p}.{ln}.weight"] = np.asarray(bp[ln]["scale"])
            sd[f"{p}.{ln}.bias"] = np.asarray(bp[ln]["bias"])
        for attn_name in ("attn", "timeattn"):
            sd[f"{p}.{attn_name}.qkv.weight"] = _t_out(bp[attn_name]["qkv"]["kernel"])
            sd[f"{p}.{attn_name}.qkv.bias"] = np.asarray(bp[attn_name]["qkv"]["bias"])
            sd[f"{p}.{attn_name}.proj.weight"] = _t_out(bp[attn_name]["proj"]["kernel"])
            sd[f"{p}.{attn_name}.proj.bias"] = np.asarray(bp[attn_name]["proj"]["bias"])
        sd[f"{p}.mlp.fc1.weight"] = _t_out(bp["mlp"]["fc1"]["kernel"])
        sd[f"{p}.mlp.fc1.bias"] = np.asarray(bp["mlp"]["fc1"]["bias"])
        sd[f"{p}.mlp.fc2.weight"] = _t_out(bp["mlp"]["fc2"]["kernel"])
        sd[f"{p}.mlp.fc2.bias"] = np.asarray(bp["mlp"]["fc2"]["bias"])

    t = params["text"]
    if text_family == "distilbert":
        _export_distilbert_text(sd, t)
    elif text_family == "bert":
        _export_bert_text(sd, t)
    elif text_family == "clip":
        _export_clip_text(sd, t, prefix="text_model.")
    else:
        raise NotImplementedError(
            f"export covers distilbert/bert/clip text towers, got {text_family!r}")

    if "txt_proj" in params:
        sd["txt_proj.1.weight"] = _t_out(params["txt_proj"]["kernel"])
        sd["txt_proj.1.bias"] = np.asarray(params["txt_proj"]["bias"])
    if "vid_proj" in params:
        sd["vid_proj.0.weight"] = _t_out(params["vid_proj"]["kernel"])
        sd["vid_proj.0.bias"] = np.asarray(params["vid_proj"]["bias"])
    if "txt_proj_2" in params:
        sd["txt_proj_2.1.weight"] = _t_out(params["txt_proj_2"]["kernel"])
        sd["txt_proj_2.1.bias"] = np.asarray(params["txt_proj_2"]["bias"])
    if "txt_local_proj" in params:
        sd["text_local_proj.1.weight"] = _t_out(params["txt_local_proj"]["kernel"])
        sd["text_local_proj.1.bias"] = np.asarray(params["txt_local_proj"]["bias"])
    if "vid_local_proj" in params:
        sd["vid_local_proj.0.weight"] = _t_out(params["vid_local_proj"]["kernel"])
        sd["vid_local_proj.0.bias"] = np.asarray(params["vid_local_proj"]["bias"])
    return sd


def export_torch_checkpoint(path: str, params: Params,
                            video_cfg: vst.SpaceTimeViTConfig,
                            epoch: int = 0,
                            text_family: str = "distilbert") -> str:
    """Write a reference-compatible .pth ({'state_dict': ..., 'epoch': ...})."""
    import torch

    sd = frozen_in_time_to_torch(params, video_cfg, text_family=text_family)
    torch.save({"state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                               for k, v in sd.items()},
                "epoch": epoch}, path)
    return path


# ------------------------------------------------------------- CLIP vision

def clip_vision_from_torch(sd: Dict[str, np.ndarray]):
    """OpenAI/vendored-CLIP state_dict → (params, ClipVisionConfig) for
    oatx.models.clip_vision. Accepts a full CLIP state_dict (text side
    ignored) or just the visual.* keys; geometry is inferred the way the
    reference's build_model does (Visualization/.../clip/model.py:405-416)."""
    from oatx.models import clip_vision as cv

    sd = strip_data_parallel_prefix(sd)
    if any(k.startswith("visual.") for k in sd):
        sd = {k[len("visual."):]: v for k, v in sd.items()
              if k.startswith("visual.")}
    conv1 = sd["conv1.weight"]  # (O, I, kh, kw)
    width = int(conv1.shape[0])
    patch_size = int(conv1.shape[-1])
    n_layers = len({k.split(".")[2] for k in sd
                    if k.startswith("transformer.resblocks.")})
    grid = int(round((sd["positional_embedding"].shape[0] - 1) ** 0.5))
    cfg = cv.ClipVisionConfig(
        input_resolution=grid * patch_size,
        patch_size=patch_size,
        width=width,
        heads=width // 64,
        layers=n_layers,
        output_dim=int(sd["proj"].shape[1]),
    )
    blocks = []
    for i in range(n_layers):
        p = f"transformer.resblocks.{i}"
        blocks.append({
            "ln_1": _ln(sd, f"{p}.ln_1"),
            "attn": {
                "qkv": {"kernel": _t(sd[f"{p}.attn.in_proj_weight"]),
                        "bias": jnp.asarray(sd[f"{p}.attn.in_proj_bias"])},
                "out": _dense(sd, f"{p}.attn.out_proj"),
            },
            "ln_2": _ln(sd, f"{p}.ln_2"),
            "mlp": {"fc1": _dense(sd, f"{p}.mlp.c_fc"),
                    "fc2": _dense(sd, f"{p}.mlp.c_proj")},
        })
    params = {
        # torch conv OIHW → jax HWIO; conv1 has no bias
        "conv1": {"kernel": jnp.asarray(
            np.ascontiguousarray(conv1.transpose(2, 3, 1, 0)))},
        "class_embedding": jnp.asarray(sd["class_embedding"]),
        "positional_embedding": jnp.asarray(sd["positional_embedding"]),
        "ln_pre": _ln(sd, "ln_pre"),
        "blocks": stack_params(blocks),
        "ln_post": _ln(sd, "ln_post"),
        # proj is a raw Parameter used as x @ W — no transpose
        "proj": jnp.asarray(sd["proj"]),
    }
    return params, cfg


def clip_vision_to_torch(params: Params) -> Dict[str, np.ndarray]:
    """oatx clip_vision param tree → bare vendored-CLIP visual-side state_dict
    ('visual.'-prefixed; round-trips with clip_vision_from_torch)."""
    sd: Dict[str, np.ndarray] = {}
    sd["visual.conv1.weight"] = np.ascontiguousarray(
        np.asarray(params["conv1"]["kernel"]).transpose(3, 2, 0, 1))
    sd["visual.class_embedding"] = np.asarray(params["class_embedding"])
    sd["visual.positional_embedding"] = np.asarray(params["positional_embedding"])
    for ln in ("ln_pre", "ln_post"):
        sd[f"visual.{ln}.weight"] = np.asarray(params[ln]["scale"])
        sd[f"visual.{ln}.bias"] = np.asarray(params[ln]["bias"])
    n_layers = params["blocks"]["ln_1"]["scale"].shape[0]
    for i in range(n_layers):
        bp = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
        p = f"visual.transformer.resblocks.{i}"
        for ln in ("ln_1", "ln_2"):
            sd[f"{p}.{ln}.weight"] = np.asarray(bp[ln]["scale"])
            sd[f"{p}.{ln}.bias"] = np.asarray(bp[ln]["bias"])
        sd[f"{p}.attn.in_proj_weight"] = _t_out(bp["attn"]["qkv"]["kernel"])
        sd[f"{p}.attn.in_proj_bias"] = np.asarray(bp["attn"]["qkv"]["bias"])
        sd[f"{p}.attn.out_proj.weight"] = _t_out(bp["attn"]["out"]["kernel"])
        sd[f"{p}.attn.out_proj.bias"] = np.asarray(bp["attn"]["out"]["bias"])
        sd[f"{p}.mlp.c_fc.weight"] = _t_out(bp["mlp"]["fc1"]["kernel"])
        sd[f"{p}.mlp.c_fc.bias"] = np.asarray(bp["mlp"]["fc1"]["bias"])
        sd[f"{p}.mlp.c_proj.weight"] = _t_out(bp["mlp"]["fc2"]["kernel"])
        sd[f"{p}.mlp.c_proj.bias"] = np.asarray(bp["mlp"]["fc2"]["bias"])
    sd["visual.proj"] = np.asarray(params["proj"])
    return sd


# ------------------------------------------------------------- CLIP text

def clip_text_from_torch(sd: Dict[str, np.ndarray]):
    """OpenAI/vendored-CLIP state_dict → (params, ClipTextConfig) for
    oatx.models.clip_text. Accepts a full CLIP state_dict (visual.* ignored)
    or just the text-side keys; geometry is inferred exactly the way the
    reference's build_model does (Visualization/.../clip/model.py:407-424)."""
    from oatx.models import clip_text as ct

    sd = strip_data_parallel_prefix(sd)
    # accept a FrozenInTime-style 'text_model.' prefix (oatx clip export)
    if any(k.startswith("text_model.token_embedding") for k in sd):
        sd = {k[len("text_model."):]: v for k, v in sd.items()
              if k.startswith("text_model.")}
    n_layers = len({k.split(".")[2] for k in sd
                    if k.startswith("transformer.resblocks.")})
    width = int(sd["ln_final.weight"].shape[0])
    cfg = ct.ClipTextConfig(
        vocab_size=int(sd["token_embedding.weight"].shape[0]),
        context_length=int(sd["positional_embedding"].shape[0]),
        width=width,
        heads=width // 64,
        layers=n_layers,
        embed_dim=int(sd["text_projection"].shape[1]),
    )
    blocks = []
    for i in range(n_layers):
        p = f"transformer.resblocks.{i}"
        blocks.append({
            "ln_1": _ln(sd, f"{p}.ln_1"),
            "attn": {
                # torch MultiheadAttention packs rows [q;k;v] in
                # in_proj_weight (3D, D) → one fused (D, 3D) kernel
                "qkv": {"kernel": _t(sd[f"{p}.attn.in_proj_weight"]),
                        "bias": jnp.asarray(sd[f"{p}.attn.in_proj_bias"])},
                "out": _dense(sd, f"{p}.attn.out_proj"),
            },
            "ln_2": _ln(sd, f"{p}.ln_2"),
            "mlp": {"fc1": _dense(sd, f"{p}.mlp.c_fc"),
                    "fc2": _dense(sd, f"{p}.mlp.c_proj")},
        })
    params = {
        "token_embedding": jnp.asarray(sd["token_embedding.weight"]),
        "positional_embedding": jnp.asarray(sd["positional_embedding"]),
        "blocks": stack_params(blocks),
        "ln_final": _ln(sd, "ln_final"),
        # text_projection is a raw Parameter used as x @ W — no transpose
        "text_projection": jnp.asarray(sd["text_projection"]),
    }
    return params, cfg
