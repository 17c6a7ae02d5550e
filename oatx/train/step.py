"""The jitted training step.

One single-program step over the global batch (pjit/GSPMD): forward both towers,
contrastive loss with global negatives (the full similarity matrix over the global
batch IS the reference's cross-replica all-gathered matrix — see
oatx.losses.contrastive), backward, AdamW update. The epoch engine
(oatx.train.trainer) calls this with batch-sharded device arrays; XLA lowers
gradient reduction and embedding gathers to ICI collectives.

Variant losses:
  baseline      L = NormSoftmax(sim(text, video))                (trainer_dist.py:158-162)
  global_local  L = NormSoftmax(sim(t, v)) + NormSoftmax(sim(pad_t, v))
                    + NormSoftmax(sim(mean tags, mean regions))  (trainer_global_local.py:187-211)
  region_mem    L = NormSoftmax(sim(t, v)) + 0.1·BCE(region_sim, patch_masks)
                                                                 (trainer_region_mem.py:157-167)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from oatx.core.module import Params
from oatx.losses import contrastive as C
from oatx.models import towers


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class LossConfig:
    name: str = "NormSoftmaxLoss"      # | 'MaxMarginRankingLoss'
    temperature: float = 0.05
    margin: float = 1.0
    region_bce_weight: float = 0.1     # trainer_region_mem.py:165
    chunked: bool = False              # memory-efficient NormSoftmax (pod-scale
    chunk_size: int = 4096             # global batches; see contrastive.py)
    object_nce_weight: float = 0.0     # stream-3: weight of the o2v + t2o NCE
    # terms on the baseline loss. The reference names an object training branch
    # that cannot run upstream (oa_model.py:125-127); this is oatx's working
    # design — 0 keeps the object tower eval-only (and FROZEN: the trainer
    # masks its updates so AdamW weight decay cannot erode untrained params).


def _pair_loss(sims: jnp.ndarray, loss_cfg: LossConfig) -> jnp.ndarray:
    if loss_cfg.name == "NormSoftmaxLoss":
        return C.norm_softmax_loss(sims, loss_cfg.temperature)
    if loss_cfg.name == "MaxMarginRankingLoss":
        return C.max_margin_ranking_loss(sims, loss_cfg.margin)
    raise ValueError(f"unknown loss {loss_cfg.name!r}")


def _embed_pair_loss(text_e: jnp.ndarray, video_e: jnp.ndarray,
                     loss_cfg: LossConfig) -> jnp.ndarray:
    """Contrastive loss from raw embeddings; routes to the chunked
    (never-materialize-the-matrix) NormSoftmax when configured."""
    if loss_cfg.chunked and loss_cfg.name == "NormSoftmaxLoss":
        return C.norm_softmax_loss_chunked(
            text_e, video_e, loss_cfg.temperature, chunk=loss_cfg.chunk_size)
    return _pair_loss(C.sim_matrix(text_e, video_e), loss_cfg)


def loss_fn(
    params: Params,
    cfg: towers.TowerConfig,
    loss_cfg: LossConfig,
    batch: Dict[str, jnp.ndarray],
    fwd_chunk: Optional[int] = None,
    mesh: Optional[Any] = None,
    gather_axes: Optional[Tuple[str, ...]] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """fwd_chunk: compute the per-sample tower outputs as lax.scan'd chunk-
    sized sub-batches with a remat'd body, then the loss over the FULL batch
    of embeddings. Unlike accum_steps this keeps EXACT large-batch contrastive
    semantics (negatives span the whole batch) in bounded memory: without it
    each chunk's f32 attention probabilities (~150 MB x depth per bs-8 chunk)
    persist as scan residuals and bs=16 already overflows a 16 GB chip. Cost
    is the remat forward (~4/3 step FLOPs): measured 82 clips/s at bs=64 vs
    104 at bs=8 plain — trade throughput for 8x the negatives per update
    (PERF.md round 3).

    mesh (with >1 batch shards — a 'data' axis, plus 'dcn' on multi-slice
    meshes) composes fwd_chunk with data parallelism:
    the tower forwards run under jax.shard_map — each chip remat-scans its
    OWN batch shard in chunk-sized pieces concurrently — and the reassembled
    global embeddings feed the loss, so negatives still span the GLOBAL
    batch. (A plain lax.scan over a data-sharded batch would serialize the
    chips: scan slices the global leading dim, putting each iteration's chunk
    on one device.) Per-chip memory is bounded at one chunk regardless of the
    global batch — pod-scale large-batch contrastive pretraining. Requires
    replicated params (pure DP: model_parallel=1, no fsdp/pipeline — the
    Trainer gates this); param cotangents are psum'd by shard_map's
    transpose.

    gather_axes (manual-DP / shard_map path — see make_train_step): this call
    is PER-SHARD; the tower forwards see the local batch shard and every
    cross-batch loss input (embeddings, the global_local region/tag features)
    is all-gathered over the named mesh axes before the loss, so negatives
    span the global batch exactly as the GSPMD path's full-batch matrix
    (reference AllGather_multi semantics, trainer_dist.py:29-45,159-161).
    Per-sample elementwise losses (region BCE) are pmean'd instead of
    gathered — identical to the global mean under equal shard sizes."""

    def gather(x: jnp.ndarray) -> jnp.ndarray:
        if gather_axes is None:
            return x
        return jax.lax.all_gather(x, gather_axes, axis=0, tiled=True)

    def scalar_mean(x: jnp.ndarray) -> jnp.ndarray:
        return jax.lax.pmean(x, gather_axes) if gather_axes is not None else x

    def fwd(f, b):
        if not fwd_chunk:
            return f(params, cfg, b)

        def local(p, lb):
            return scan_chunked(jax.checkpoint(lambda mb: f(p, cfg, mb)),
                                fwd_chunk)(lb)

        from oatx.parallel.mesh import batch_axes, batch_shards

        if mesh is not None and batch_shards(mesh) > 1:
            from jax.sharding import PartitionSpec as P

            # the batch spec must name EVERY axis the batch shards over
            # (('dcn','data') on a multi-slice mesh): shard_map treats
            # unmentioned mesh axes as replicated, which would silently give
            # each dcn slice the wrong batch shard
            bspec = P(batch_axes(mesh))
            return jax.shard_map(local, mesh=mesh, in_specs=(P(), bspec),
                                 out_specs=bspec, check_vma=False)(params, b)
        return local(params, b)

    if cfg.variant == "baseline":
        text_e, video_e = fwd(towers.forward_baseline, batch)
        text_e, video_e = gather(text_e), gather(video_e)
        loss = _embed_pair_loss(text_e, video_e, loss_cfg)
        metrics = {"loss": loss}
        if (loss_cfg.object_nce_weight > 0 and cfg.object_tower is not None
                and "object" in batch):
            obj_e = gather(towers.compute_object(params, cfg, batch["object"]))
            l_obj = (_embed_pair_loss(obj_e, video_e, loss_cfg)
                     + _embed_pair_loss(text_e, obj_e, loss_cfg))
            loss = loss + loss_cfg.object_nce_weight * l_obj
            metrics = {"loss": loss, "loss_object": l_obj}
        return loss, metrics
    if cfg.variant == "global_local":
        out = fwd(towers.forward_global_local, batch)
        l_st2sv = _pair_loss(
            C.sim_matrix(gather(out["text_embeds"]), gather(out["video_embeds"])),
            loss_cfg)
        l_lt2sv = _pair_loss(
            C.sim_matrix(gather(out["pad_text_embeds"]), gather(out["video_embeds"])),
            loss_cfg)
        l_fine = C.fine_grained_region_tag_loss(
            gather(out["region_feat"]), gather(out["tags_feat"]),
            loss_cfg.temperature)
        loss = l_st2sv + l_lt2sv + l_fine
        return loss, {"loss": loss, "loss_st2sv": l_st2sv, "loss_lt2sv": l_lt2sv,
                      "loss_fine": l_fine}
    if cfg.variant == "region_mem":
        out = fwd(towers.forward_region_mem, batch)
        l_nce = _pair_loss(
            C.sim_matrix(gather(out["text_embeds"]), gather(out["video_embeds"])),
            loss_cfg)
        l_region = scalar_mean(
            C.region_bce(out["region_sim_logits"], batch["patch_masks"]))
        loss = l_nce + loss_cfg.region_bce_weight * l_region
        return loss, {"loss": loss, "loss_nce": l_nce, "loss_region": l_region}
    raise ValueError(f"unknown variant {cfg.variant!r}")


def make_augmenter(transform_cfg=None, train: bool = True,
                   tower_cfg: Optional[towers.TowerConfig] = None):
    """Batch augmenter applied INSIDE the jitted step: uint8 canonical frames →
    normalized float (train: random crop/flip/jitter; eval: deterministic resize).
    Fused by XLA with the forward — the host ships uint8 only. The output
    resolution follows the tower's img_size when tower_cfg is given."""
    from oatx.data import transforms as T

    if transform_cfg is None:
        res = tower_cfg.video.img_size if tower_cfg is not None else 224
        transform_cfg = T.TransformConfig(input_res=res)
    tcfg = transform_cfg

    def augment(rng: jax.Array, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        out = dict(batch)
        for i, key in enumerate(("video", "object_frame")):
            if key in out and out[key].dtype == jnp.uint8:
                if train:
                    out[key] = T.train_augment(jax.random.fold_in(rng, i), out[key], tcfg)
                else:
                    out[key] = T.eval_transform(out[key], tcfg)
        return out

    return augment


def _manual_dp_grads(params, batch, cfg, loss_cfg, fwd_chunk, mesh,
                     axes: Tuple[str, ...], grad_reduce_dtype):
    """Manual data-parallel value_and_grad under jax.shard_map.

    Why this exists (PERF.md round 5): under GSPMD, a weight used by TWO dots
    (the split-CLS residual stream applies every video-block weight to the
    patch stream and the CLS stream) gets its two gradient cotangents
    all-reduced SEPARATELY — XLA's SPMD partitioner places the all-reduce at
    each dot's cotangent and never reassociates add(AR(a), AR(b)) → AR(a+b),
    inflating ViT-B DP gradient traffic by +71%. Here the whole backward runs
    per shard (duplicate cotangents are plain local adds) and the gradient
    crosses the mesh exactly ONCE per parameter leaf via an explicit pmean —
    traffic is exactly the ring all-reduce of param_bytes, regardless of how
    many ops share a weight (tests/test_manual_dp.py audits the bytes).

    Semantics: the body computes the per-shard forward, all-gathers the
    embedding sets over `axes` (loss_fn gather_axes), and evaluates the SAME
    global-negative loss the GSPMD path computes. Each shard's AD seeds its
    own (identical) loss copy, so the per-shard cotangents sum to
    n_shards·dL/dθ across the mesh — pmean (not psum) recovers dL/dθ; the
    parity tests pin this against the single-device gradient.

    grad_reduce_dtype (e.g. jnp.bfloat16): cast gradients to a narrower dtype
    for the cross-chip reduction only — halves DP gradient bandwidth; the
    optimizer still updates in the parameter dtype. Opt-in, off by default.
    The casts are pinned with optimization_barrier so the lowered module
    carries a genuine bf16 all-reduce (tests/test_manual_dp.py asserts the
    StableHLO dtype). Backend note, measured: XLA:TPU executes bf16
    collectives natively; XLA:CPU legalizes them back to f32 converts at
    compile time ('convert_convert_fusion' feeding an f32 all-reduce), so the
    per-shard bf16 ROUNDING still happens on CPU but the bandwidth saving is
    TPU-only — the CPU-mesh byte audit cannot show it.

    Requires replicated params (pure DP: no fsdp/model axis/pipeline — the
    Trainer gates this). fwd_chunk composes: the remat'd chunk scan runs
    per shard inside the same shard_map body."""
    from jax.sharding import PartitionSpec as P

    bspec = P(axes)

    def body(p, lb):
        (loss, metrics), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, cfg, loss_cfg, lb, fwd_chunk, None, axes)
        if grad_reduce_dtype is not None:
            # optimization_barrier on BOTH sides of the reduce: XLA's
            # excess-precision simplifier otherwise cancels the
            # f32→bf16→all-reduce→f32 convert pair and silently promotes the
            # reduce back to f32 — verified in compiled HLO; the barriers pin
            # the narrow dtype on the wire (they compile to nothing else)
            g = jax.lax.optimization_barrier(jax.tree_util.tree_map(
                lambda x: x.astype(grad_reduce_dtype), g))
        g = jax.lax.pmean(g, axes)
        if grad_reduce_dtype is not None:
            g = jax.tree_util.tree_map(
                lambda x, pp: x.astype(pp.dtype),
                jax.lax.optimization_barrier(g), p)
        return (loss, metrics), g

    return jax.shard_map(body, mesh=mesh, in_specs=(P(), bspec),
                         out_specs=P(), check_vma=False)(params, batch)


def make_train_step(
    cfg: towers.TowerConfig,
    loss_cfg: LossConfig,
    optimizer: optax.GradientTransformation,
    donate: bool = True,
    augment: Optional[Callable] = None,
    base_rng: Optional[jax.Array] = None,
    accum_steps: int = 1,
    skip_nonfinite: bool = False,
    fwd_chunk: Optional[int] = None,
    mesh: Optional[Any] = None,
    manual_axes: Optional[Tuple[str, ...]] = None,
    grad_reduce_dtype: Optional[Any] = None,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted train step. State is donated (params updated in place in
    HBM). Shard the batch over the mesh's data axis before calling. If `augment`
    is given it runs inside the step with a per-step rng folded from base_rng.

    accum_steps > 1 splits the batch into micro-batches scanned inside the step,
    averaging gradients before one optimizer update (memory ↔ step-size trade;
    the reference has no equivalent — SURVEY.md §2.5). NOTE: with the
    contrastive loss, negatives then span a micro-batch rather than the full
    batch — the loss value reflects micro-batch negatives, like training with a
    smaller batch at the same optimizer cadence.

    fwd_chunk computes the tower forwards as remat'd chunk-sized scan
    iterations while the contrastive loss still spans the FULL batch — exact
    large-batch negative semantics in bounded memory, at ~4/3 the FLOPs (see
    loss_fn). With `mesh` (data axis > 1, replicated params) the scan runs
    per-chip under shard_map and the loss spans the GLOBAL batch — per-chip
    memory stays one chunk no matter the global batch. Does NOT compose with
    accum_steps' micro-batch negatives (they chunk the LOSS) — the Trainer
    rejects that combination.

    skip_nonfinite=True makes a step whose loss or gradients are non-finite a
    NO-OP (params, optimizer moments and the step counter keep their previous
    values; metrics report skipped=1). One corrupt batch then cannot poison
    the Adam moments — crash-free large-scale pretraining; the reference would
    NaN the whole run (trainer_dist.py has no guard)."""
    if base_rng is None:
        base_rng = jax.random.PRNGKey(0)

    def grads_of(params, batch):
        if manual_axes:
            return _manual_dp_grads(params, batch, cfg, loss_cfg, fwd_chunk,
                                    mesh, manual_axes, grad_reduce_dtype)
        return jax.value_and_grad(loss_fn, has_aux=True)(
            params, cfg, loss_cfg, batch, fwd_chunk, mesh)

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        if augment is not None:
            rng = jax.random.fold_in(base_rng, state.step)
            batch = augment(rng, batch)
        if accum_steps <= 1:
            (loss, metrics), grads = grads_of(state.params, batch)
        else:
            def split(x):
                if x.shape[0] % accum_steps != 0:
                    raise ValueError(
                        f"batch size {x.shape[0]} not divisible by "
                        f"accum_steps={accum_steps}")
                return x.reshape(accum_steps, x.shape[0] // accum_steps, *x.shape[1:])

            micro = {k: split(v) for k, v in batch.items()}

            def body(carry, mb):
                (l, m), g = grads_of(state.params, mb)
                acc = jax.tree_util.tree_map(jnp.add, carry, g)
                return acc, m  # per-micro metrics stack as scan outputs

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            gsum, m_stack = jax.lax.scan(body, zero, micro)
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, gsum)
            # keep every aux loss term (loss_fine/loss_region/loss_object...)
            metrics = {k: jnp.mean(v) for k, v in m_stack.items()}
            loss = metrics["loss"]
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(params, opt_state, state.step + 1)
        if skip_nonfinite:
            ok = jnp.isfinite(loss) & jnp.isfinite(metrics["grad_norm"])
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new, old)
            new_state = TrainState(keep(new_state.params, state.params),
                                   keep(new_state.opt_state, state.opt_state),
                                   jnp.where(ok, new_state.step, state.step))
            metrics["skipped"] = (~ok).astype(jnp.float32)
            metrics["loss"] = jnp.where(ok, loss, jnp.float32(0))
            metrics["grad_norm"] = jnp.where(ok, metrics["grad_norm"], jnp.float32(0))
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def scan_chunked(fn: Callable, chunk: int) -> Callable:
    """Wrap a batch→pytree function so batches larger than `chunk` run as
    lax.scan'd chunk-sized sub-batches inside the SAME trace. Above bs≈16 XLA
    materializes layout transposes around the divided-attention reshapes
    (copy/reshape classes blow up 14–90×, PERF.md round 3); the scan body keeps
    the copy-free small-batch tilings and one dispatch covers the whole batch.
    The leading dim must be divisible by `chunk`; batches ≤ chunk pass through."""

    def wrapped(batch):
        b = jax.tree_util.tree_leaves(batch)[0].shape[0]
        if b <= chunk:
            return fn(batch)
        if b % chunk != 0:
            raise ValueError(f"batch {b} not divisible by chunk={chunk}")
        n = b // chunk
        sub = jax.tree_util.tree_map(
            lambda x: x.reshape((n, chunk) + x.shape[1:]), batch)
        _, outs = jax.lax.scan(lambda c, mb: (c, fn(mb)),
                               jnp.zeros((), jnp.int32), sub)
        return jax.tree_util.tree_map(
            lambda x: x.reshape((b,) + x.shape[2:]), outs)

    return wrapped


def make_eval_step(cfg: towers.TowerConfig, augment: Optional[Callable] = None,
                   chunk: Optional[int] = None) -> Callable:
    """Jitted embedding step for validation/retrieval eval: returns the embeddings
    (host gathers and computes metrics — reference _valid_epoch semantics).

    chunk: when set, a batch larger than `chunk` is processed as lax.scan'd
    sub-batches of that size inside ONE jit call. Rationale (PERF.md round 3,
    device traces): above bs≈16 XLA materializes layout transposes around the
    divided-attention reshapes (copy/reshape op classes blow up 14–90×, 54% of
    the bs=64 step) while the matmuls scale fine; scanning bs=`chunk` sub-
    batches keeps the copy-free small-batch tilings, and the single dispatch
    amortizes the per-call overhead a bs-8 loop would pay per sub-batch. The
    batch leading dim must be divisible by `chunk` (eval loaders pad already);
    batches ≤ chunk run unscanned."""
    if augment is None:
        augment = make_augmenter(train=False, tower_cfg=cfg)

    def body(params: Params, batch: Dict[str, jnp.ndarray]):
        batch = augment(jax.random.PRNGKey(0), batch)
        out = towers.forward(params, cfg, batch)
        if cfg.variant == "baseline":
            text_e, video_e = out
            return {"text_embeds": text_e, "video_embeds": video_e}
        return {k: v for k, v in out.items() if k.endswith("_embeds")}

    if chunk is None:
        return jax.jit(body)

    def step(params: Params, batch: Dict[str, jnp.ndarray]):
        return scan_chunked(lambda mb: body(params, mb), chunk)(batch)

    return jax.jit(step)


def init_state(
    rng: jax.Array,
    cfg: towers.TowerConfig,
    optimizer: optax.GradientTransformation,
    params: Optional[Params] = None,
) -> TrainState:
    if params is None:
        params = towers.init(rng, cfg)
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
