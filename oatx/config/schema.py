"""Typed experiment configuration, JSON-schema-compatible with the reference.

The reference drives everything from JSON files (configs/**.json) with schema
{name, n_gpu, arch{type, object, stream, args{video_params, object_params,
text_params, projection, load_checkpoint}}, data_loader (dict | list), optimizer,
loss, metrics, trainer{...}, visualizer} — see
/root/reference/OATrans/configs/pt/cc3m_webvid/norm.json and
parse_config_dist_multi.py:13-150. oatx accepts those files unchanged and
normalizes them into the dataclasses here (the reference's reflection-based
`initialize(name, module)` is replaced by the explicit registry in
oatx.config.registry).

Extensions (ignored by the reference, used by oatx):
  arch.variant          — 'baseline' | 'global_local' | 'region_mem' (the reference
                          encodes this in the choice of entry-point script)
  trainer.precision     — 'bf16' (default) | 'f32'
  trainer.model_parallel — model-axis size of the device mesh (default 1)
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax.numpy as jnp


def _get(d: Dict[str, Any], key: str, default=None):
    v = d.get(key, default)
    return default if v is None else v


@dataclasses.dataclass
class VideoParamsCfg:
    model: str = "SpaceTimeTransformer"
    arch_config: str = "base_patch16_224"
    num_frames: int = 4
    pretrained: bool = True
    time_init: str = "zeros"
    two_outputs: bool = False
    input_res: int = 224
    # optional explicit dims (smoke/hermetic runs); None → from arch_config
    embed_dim: Optional[int] = None
    depth: Optional[int] = None
    num_heads: Optional[int] = None
    remat: bool = False
    remat_policy: str = "full"  # 'full' | 'dots' | 'dots_all'; only read when
    # remat=true (vit_spacetime._remat_policy). Measured guidance (PERF.md):
    # ViT-B/L 4-frame fit without remat (remat=false wins); ViT-H needs
    # remat=true and 'dots_all' is the best policy there.
    sequence_parallel: bool = False  # shard token axis over the model mesh axis
    split_cls_stream: Optional[bool] = None  # None → library default
    # (vit_spacetime.SpaceTimeViTConfig.split_cls_stream)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "VideoParamsCfg":
        return cls(
            model=_get(d, "model", "SpaceTimeTransformer"),
            arch_config=_get(d, "arch_config", "base_patch16_224"),
            num_frames=int(_get(d, "num_frames", 4)),
            pretrained=bool(_get(d, "pretrained", True)),
            time_init=_get(d, "time_init", "zeros"),
            two_outputs=bool(_get(d, "two_outputs", False)),
            input_res=int(_get(d, "input_res", 224)),
            embed_dim=d.get("embed_dim"),
            depth=d.get("depth"),
            num_heads=d.get("num_heads"),
            remat=bool(_get(d, "remat", False)),
            remat_policy=_get(d, "remat_policy", "full"),
            sequence_parallel=bool(_get(d, "sequence_parallel", False)),
            split_cls_stream=d.get("split_cls_stream"),
        )


@dataclasses.dataclass
class TextParamsCfg:
    model: str = "distilbert-base-uncased"
    pretrained: bool = True
    input: str = "text"
    two_outputs: bool = False
    object_tags: bool = False
    # optional explicit dims (smoke/hermetic runs)
    vocab_size: Optional[int] = None
    dim: Optional[int] = None
    hidden_dim: Optional[int] = None
    n_layers: Optional[int] = None
    n_heads: Optional[int] = None

    @property
    def family(self) -> str:
        """'distilbert' | 'bert' — the reference dispatches on the basename
        prefix (model.py:104-110, oa_model_global_local.py:211-214) — plus
        oatx's first-party 'clip' text tower (models/clip_text.py)."""
        base = self.model.split("/")[-1]
        if base.startswith("distilbert"):
            return "distilbert"
        if base.startswith("bert"):
            return "bert"
        if base.startswith("clip"):
            return "clip"
        return base

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TextParamsCfg":
        return cls(
            model=_get(d, "model", "distilbert-base-uncased"),
            pretrained=bool(_get(d, "pretrained", True)),
            input=_get(d, "input", "text"),
            two_outputs=bool(_get(d, "two_outputs", False)),
            object_tags=bool(_get(d, "object_tags", False)),
            vocab_size=d.get("vocab_size"),
            dim=d.get("dim"),
            hidden_dim=d.get("hidden_dim"),
            n_layers=d.get("n_layers"),
            n_heads=d.get("n_heads"),
        )


@dataclasses.dataclass
class ObjectParamsCfg:
    model: str = ""
    input_objects: bool = False
    input_object_bboxs: bool = False
    pseudo_labels: bool = False
    top_k: int = 10

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ObjectParamsCfg":
        return cls(
            model=_get(d, "model", ""),
            input_objects=bool(_get(d, "input_objects", False)),
            input_object_bboxs=bool(_get(d, "input_object_bboxs", False)),
            pseudo_labels=bool(_get(d, "pseudo_labels", False)),
            top_k=int(_get(d, "top_k", 10)),
        )


@dataclasses.dataclass
class ArchCfg:
    type: str = "FrozenInTime"
    variant: str = "baseline"
    object: bool = False
    stream: int = 2
    video_params: VideoParamsCfg = dataclasses.field(default_factory=VideoParamsCfg)
    text_params: TextParamsCfg = dataclasses.field(default_factory=TextParamsCfg)
    object_params: ObjectParamsCfg = dataclasses.field(default_factory=ObjectParamsCfg)
    projection: str = "minimal"
    projection_dim: int = 256
    load_checkpoint: str = ""
    load_temporal_fix: str = "zeros"

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ArchCfg":
        args = _get(d, "args", {})
        return cls(
            type=_get(d, "type", "FrozenInTime"),
            variant=_get(d, "variant", "baseline"),
            object=bool(_get(d, "object", False)),
            stream=int(_get(d, "stream", 2)),
            video_params=VideoParamsCfg.from_dict(_get(args, "video_params", {})),
            text_params=TextParamsCfg.from_dict(_get(args, "text_params", {})),
            object_params=ObjectParamsCfg.from_dict(_get(args, "object_params", {})),
            projection=_get(args, "projection", "minimal"),
            projection_dim=int(_get(args, "projection_dim", 256)),
            load_checkpoint=_get(args, "load_checkpoint", "") or "",
            load_temporal_fix=_get(args, "load_temporal_fix", "zeros"),
        )


@dataclasses.dataclass
class DataLoaderCfg:
    type: str = "TextVideoDataLoader"
    dataset_name: str = "MSRVTT"
    data_dir: str = ""
    object_dir: str = ""
    metadata_dir: Optional[str] = None
    reader: str = "cv2"
    shuffle: bool = True
    num_workers: int = 4
    batch_size: int = 16
    split: str = "train"
    cut: Optional[str] = None
    subsample: float = 1  # <1 keeps that fraction of metadata (reference base_dataset.py:46)
    echo_factor: int = 1  # data echoing: E optimizer steps per decoded batch
    # (fresh device-side augmentations per echo); lever for host-decode-bound
    # deployments (PERF.md "Integrated input-pipeline"). Train-split only.
    text_params: Dict[str, Any] = dataclasses.field(default_factory=dict)
    object_params: Dict[str, Any] = dataclasses.field(default_factory=dict)
    video_params: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def input_res(self) -> int:
        return int(_get(self.video_params, "input_res", 224))

    @property
    def num_frames(self) -> int:
        return int(_get(self.video_params, "num_frames", 4))

    @property
    def loading(self) -> str:
        return _get(self.video_params, "loading", "strict")

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "DataLoaderCfg":
        args = _get(d, "args", {})
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in args.items() if k in fields}
        return cls(type=_get(d, "type", "TextVideoDataLoader"), **kwargs)


@dataclasses.dataclass
class OptimizerCfg:
    type: str = "AdamW"  # AdamW (reference) | Adafactor (factored 2nd
    # moments — the ViT-H-scale memory lever) | Lion | SGD (train/optim.py)
    lr: float = 2e-4
    weight_decay: float = 0.01
    grad_clip: Optional[float] = None
    milestones: List[int] = dataclasses.field(default_factory=lambda: [60, 80])
    gamma: float = 0.1
    schedule: str = "step"     # step (reference) | cosine | constant
    warmup_steps: int = 0      # linear 0→lr ramp prepended to the schedule
    lr_min: float = 0.0        # cosine floor

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "OptimizerCfg":
        args = _get(d, "args", {})
        if isinstance(_get(args, "schedule", "step"), (list, tuple)):
            raise ValueError(
                "optimizer.args.schedule is the schedule KIND "
                "(step|cosine|constant); decay epochs go in "
                "optimizer.args.milestones")
        return cls(
            type=_get(d, "type", "AdamW"),
            lr=float(_get(args, "lr", 2e-4)),
            weight_decay=float(_get(args, "weight_decay", 0.01)),
            grad_clip=args.get("grad_clip"),
            milestones=list(_get(args, "milestones", [60, 80])),
            gamma=float(_get(args, "gamma", 0.1)),
            schedule=str(_get(args, "schedule", "step")),
            warmup_steps=int(_get(args, "warmup_steps", 0)),
            lr_min=float(_get(args, "lr_min", 0.0)),
        )


@dataclasses.dataclass
class LossCfg:
    type: str = "NormSoftmaxLoss"
    temperature: float = 0.05
    margin: float = 1.0
    region_bce_weight: float = 0.1
    chunked: bool = False
    chunk_size: int = 4096
    object_nce_weight: float = 0.0  # >0: train the stream-3 object tower

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "LossCfg":
        args = _get(d, "args", {})
        return cls(
            type=_get(d, "type", "NormSoftmaxLoss"),
            temperature=float(_get(args, "temperature", 0.05)),
            margin=float(_get(args, "margin", 1.0)),
            region_bce_weight=float(_get(args, "region_bce_weight", 0.1)),
            chunked=bool(_get(args, "chunked", False)),
            chunk_size=int(_get(args, "chunk_size", 4096)),
            object_nce_weight=float(_get(args, "object_nce_weight", 0.0)),
        )


@dataclasses.dataclass
class TrainerCfg:
    epochs: int = 100
    max_samples_per_epoch: int = 1_000_000
    save_dir: str = "exps"
    save_period: int = 5
    verbosity: int = 2
    monitor: str = "min val_loss_0"
    early_stop: int = 10
    init_val: bool = True
    val_period: int = 1        # validate every N epochs (reference validates
    # every epoch — base_trainer.py:101; >1 amortizes eval cost on long
    # overfit/ablation runs; the last epoch always validates so monitor/best
    # still sees a final score)
    neptune: bool = False
    precision: str = "bf16"
    model_parallel: int = 1
    dcn_slices: int = 1        # >1: multi-slice pod mesh ('dcn','data','model')
    # — pure data parallelism ACROSS slices (only the gradient reduce crosses
    # DCN); fsdp/TP/sequence-parallel shards stay intra-slice on ICI
    # (parallel/mesh.make_mesh)
    seed: int = 0
    accum_steps: int = 1       # gradient accumulation micro-steps
    fwd_chunk: int = 0         # >0: remat-scan the tower forwards in chunks of
    # this size with the contrastive loss over the FULL batch — exact large-
    # batch negatives in bounded memory (vs accum_steps' micro-batch
    # negatives), ~4/3 FLOPs. Single chip, or a >1 data axis with replicated
    # params (per-chip shard_map scan, GLOBAL-batch negatives) — see
    # train/step.py loss_fn
    dp_mode: str = "auto"      # 'auto' | 'gspmd' | 'manual' — how data-parallel
    # gradients cross the mesh. 'manual' runs the per-shard backward under
    # shard_map with ONE explicit pmean per parameter leaf (step.py
    # _manual_dp_grads): under GSPMD a weight used by two dots (split-CLS
    # stream) gets its cotangents all-reduced SEPARATELY (+71% ViT-B DP
    # gradient bytes — PERF.md round 5); manual reduces exactly param_bytes.
    # Needs replicated params (pure DP). 'auto' = manual when eligible.
    grad_reduce_dtype: str = ""  # 'bf16': cast gradients for the cross-chip
    # reduce only (manual dp_mode) — halves DP gradient bandwidth on TPU
    # (XLA:CPU legalizes bf16 collectives back to f32 — step.py
    # _manual_dp_grads); optimizer updates stay in the param dtype. Off by
    # default (exact f32 reduction).
    zero1: bool = False        # shard optimizer state over the data axis
    fsdp: bool = False         # ZeRO-3 analogue: params (+ their moments)
    # sharded over the data axis (GSPMD weight-gathered schedule); subsumes zero1
    pipeline: bool = False     # model axis = GPipe stages over the video block
    # stack (parallel/pipeline.py) instead of Megatron TP kernel shards
    pipeline_microbatches: int = 4
    cycle_shorter: bool = False  # wrap shorter loaders instead of truncating
    skip_nonfinite: bool = False  # non-finite loss/grad step = no-op (crash-free)
    ema_decay: float = 0.0     # >0: keep a post-update parameter EMA in the
    # optimizer state (optim.ema_of_params) — checkpointed/sharded with the
    # moments; beyond the reference. Typical 0.999-0.9999.
    ema_eval: bool = True      # validate (and monitor best) with the EMA
    # params when ema_decay > 0; raw params otherwise
    profile_epoch: int = 0     # >0: capture a jax.profiler device trace during
    # this epoch (steps [profile_start_step, +profile_steps)), written to
    # <log_dir>/profile and summarized into the run log — in-run counterpart
    # of tools/exp_step_trace.py
    profile_start_step: int = 5   # past warm-up/compile steps
    profile_steps: int = 4
    async_checkpoint: bool = False  # commit periodic/best snapshots in a
    # background thread (Orbax AsyncCheckpointer): training resumes after the
    # device→host copy instead of stalling for the full ~GB state write.
    # Preemption snapshots always stay synchronous.
    # iteration-based training (reference len_epoch + inf_loop,
    # trainer_dist.py:72-79): fixed cycles per epoch, loaders cycle endlessly
    len_epoch: Optional[int] = None

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TrainerCfg":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


@dataclasses.dataclass
class ExperimentCfg:
    name: str = "experiment"
    n_gpu: int = 1
    arch: ArchCfg = dataclasses.field(default_factory=ArchCfg)
    data_loaders: List[DataLoaderCfg] = dataclasses.field(default_factory=list)
    optimizer: OptimizerCfg = dataclasses.field(default_factory=OptimizerCfg)
    loss: LossCfg = dataclasses.field(default_factory=LossCfg)
    metrics: List[str] = dataclasses.field(default_factory=lambda: ["t2v_metrics", "v2t_metrics"])
    trainer: TrainerCfg = dataclasses.field(default_factory=TrainerCfg)
    visualizer: Dict[str, Any] = dataclasses.field(default_factory=dict)
    raw: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ExperimentCfg":
        dl = _get(d, "data_loader", [])
        if isinstance(dl, dict):
            dl = [dl]
        return cls(
            name=_get(d, "name", "experiment"),
            n_gpu=int(_get(d, "n_gpu", 1)),
            arch=ArchCfg.from_dict(_get(d, "arch", {})),
            data_loaders=[DataLoaderCfg.from_dict(x) for x in dl],
            optimizer=OptimizerCfg.from_dict(_get(d, "optimizer", {})),
            loss=LossCfg.from_dict(_get(d, "loss", {})),
            metrics=list(_get(d, "metrics", ["t2v_metrics", "v2t_metrics"])),
            trainer=TrainerCfg.from_dict(_get(d, "trainer", {})),
            visualizer=_get(d, "visualizer", {}),
            raw=d,
        )

    @classmethod
    def from_json(cls, path: str | Path) -> "ExperimentCfg":
        with open(path) as f:
            return cls.from_dict(json.load(f))


ARCH_TABLE = {  # arch_config → (embed_dim, depth, num_heads, patch)
    # timm ViT geometry names. The reference ships base only
    # (video_transformer.py SpaceTimeTransformer defaults); the other
    # sizes are oatx extensions — same tower, scaled dims. large/huge
    # pretrains want remat and/or fsdp (docs/parallelism.md). Module-level
    # so measurement tools (tools/exp_vitl_real.py) benchmark the SAME
    # geometries the recipes train.
    "base_patch16_224": (768, 12, 12, 16),
    "small_patch16_224": (384, 12, 6, 16),
    "tiny_patch16_224": (192, 12, 3, 16),
    "large_patch16_224": (1024, 24, 16, 16),
    "huge_patch14_224": (1280, 32, 16, 14),
}


def build_tower_config(arch: ArchCfg, compute_dtype=None):
    """ArchCfg → oatx.models.towers.TowerConfig."""
    from oatx.models import distilbert as dbert
    from oatx.models import towers
    from oatx.models import vit_spacetime as vst

    if arch.video_params.model != "SpaceTimeTransformer":
        raise NotImplementedError(f"video model {arch.video_params.model!r}")
    if arch.text_params.family not in ("distilbert", "bert", "clip"):
        raise NotImplementedError(f"text model family {arch.text_params.family!r}")

    if arch.video_params.arch_config not in ARCH_TABLE:
        raise NotImplementedError(f"arch_config {arch.video_params.arch_config!r}")
    embed_dim, depth, heads, patch = ARCH_TABLE[arch.video_params.arch_config]
    vp = arch.video_params
    video = vst.SpaceTimeViTConfig(
        img_size=vp.input_res,
        patch_size=patch,
        embed_dim=vp.embed_dim or embed_dim,
        depth=vp.depth or depth,
        num_heads=vp.num_heads or heads,
        num_frames=vp.num_frames,
        time_init=vp.time_init,
        remat=vp.remat,
        remat_policy=vp.remat_policy,
        sequence_parallel=vp.sequence_parallel,
        **({} if vp.split_cls_stream is None
           else {"split_cls_stream": vp.split_cls_stream}),
    )
    tp = arch.text_params
    if tp.family == "clip":
        from oatx.models.clip_text import ClipTextConfig

        # dim → transformer width; embedding output = width (CLIP ViT-B text)
        text = ClipTextConfig(
            vocab_size=tp.vocab_size or 49408,
            width=tp.dim or 512,
            heads=tp.n_heads or (tp.dim or 512) // 64,
            layers=tp.n_layers or 12,
            embed_dim=tp.dim or 512,
        )
    elif tp.family == "bert":
        from oatx.models.bert import BertConfig

        text = BertConfig(
            vocab_size=tp.vocab_size or 30522,
            dim=tp.dim or 768,
            hidden_dim=tp.hidden_dim or 3072,
            n_layers=tp.n_layers or 12,
            n_heads=tp.n_heads or 12,
        )
    else:
        text = dbert.DistilBertConfig(
            vocab_size=tp.vocab_size or 30522,
            dim=tp.dim or 768,
            hidden_dim=tp.hidden_dim or 3072,
            n_layers=tp.n_layers or 6,
            n_heads=tp.n_heads or 12,
        )
    if compute_dtype is None:
        compute_dtype = jnp.float32
    object_tower = None
    if arch.object_params.model or arch.stream == 3:
        # reference arch.stream == 3 / object_params.model names an object
        # branch that is bit-rotten upstream (oa_model.py:125-127); oatx maps
        # it to the working object tower (models/object_tower.py)
        from oatx.models.object_tower import ObjectTowerConfig

        object_tower = ObjectTowerConfig(top_k=arch.object_params.top_k)
    return towers.TowerConfig(
        video=video,
        text=text,
        text_family=tp.family,
        projection_dim=arch.projection_dim,
        projection=arch.projection,
        variant=arch.variant,
        compute_dtype=compute_dtype,
        object_tower=object_tower,
    )
