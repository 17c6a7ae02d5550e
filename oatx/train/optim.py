"""Optimizers, LR schedules, and parameter freezing (optax).

Reference parity:
  * AdamW lr 2e-4 (configs/pt/cc3m_webvid/norm.json:82-87);
  * step decay ×0.1 at epoch milestones [60, 80]
    (trainer_dist.py:117-122 _adjust_learning_rate);
  * linear-probe freezing: train only vid_proj/txt_proj
    (utils/param_forzen.py:4-10, gated by train_dist_multi.py linear_eval).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import optax


def step_decay_schedule(
    base_lr: float,
    steps_per_epoch: int,
    milestones: Sequence[int] = (60, 80),
    gamma: float = 0.1,
) -> optax.Schedule:
    """lr = base · gamma^(#milestone epochs passed)."""
    boundaries = {int(m) * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_schedule(
    base_lr: float,
    steps_per_epoch: int,
    total_epochs: int,
    kind: str = "step",
    milestones: Sequence[int] = (60, 80),
    gamma: float = 0.1,
    warmup_steps: int = 0,
    lr_min: float = 0.0,
) -> optax.Schedule:
    """LR schedule factory (`optimizer.args.schedule`):

      step     — the reference's epoch-milestone ×gamma decay
                 (trainer_dist.py:117-122); the default.
      cosine   — cosine from base_lr to lr_min over all remaining steps
                 (beyond the reference; the standard recipe for large-batch
                 contrastive pretraining, e.g. with trainer.fwd_chunk).
      constant — flat base_lr.

    warmup_steps > 0 prepends a linear 0→base_lr ramp (also beyond the
    reference — large batches need it; it shifts the decay phase, not the
    total step count)."""
    total = max(int(total_epochs) * int(steps_per_epoch), 1)
    if kind == "step":
        main = step_decay_schedule(base_lr, steps_per_epoch, milestones, gamma)
    elif kind == "cosine":
        main = optax.cosine_decay_schedule(
            base_lr, decay_steps=max(total - warmup_steps, 1),
            alpha=(lr_min / base_lr if base_lr else 0.0))
    elif kind == "constant":
        main = optax.constant_schedule(base_lr)
    else:
        raise ValueError(f"unknown LR schedule {kind!r} "
                         "(expected step|cosine|constant)")
    if warmup_steps > 0:
        warm = optax.linear_schedule(0.0, base_lr, warmup_steps)
        return optax.join_schedules([warm, main], [warmup_steps])
    return main


def make_optimizer(
    lr: float | optax.Schedule = 2e-4,
    weight_decay: float = 0.01,
    betas: Optional[Tuple[float, float]] = None,
    eps: float = 1e-8,
    grad_clip: Optional[float] = None,
    trainable_filter=None,
    ema_decay: Optional[float] = None,
    kind: str = "adamw",
) -> optax.GradientTransformation:
    """Optimizer factory (`optimizer.type`), plus optional global-norm
    clipping, a trainable-parameter mask (path-predicate) for linear-probe
    freezing, and an optional post-update parameter EMA carried in the
    optimizer state.

      adamw     — torch-default hyperparams; the reference's optimizer
                  (configs norm.json:82-87). Default. State: 2 moments
                  (2x params bytes in f32).
      adafactor — factored second moments (optax.adafactor): optimizer state
                  collapses from O(params) to O(rows+cols) for matrix params.
                  THE memory lever at ViT-H scale, where AdamW state
                  (~10.6 GiB) is what forces remat on a 16 GB chip
                  (PERF.md round-4 remat decision tree) — beyond the
                  reference, standard for big-vision/T5-style TPU training.
      lion      — sign-momentum (optax.lion): 1 moment (half of AdamW's
                  state), typically wants ~3-10x smaller lr and ~3-10x larger
                  weight decay than AdamW.
      sgd       — momentum SGD + decoupled weight decay; the cheap baseline
                  (1 moment).

    All compose identically with grad_clip / freezing / EMA / zero1-fsdp
    state sharding (the sharding rules are pytree-generic)."""
    k = kind.lower()
    # betas=None → per-family defaults (adamw/sgd: torch defaults; lion:
    # the paper's (0.9, 0.99)); an explicit betas is always honored verbatim
    if betas is None:
        betas = (0.9, 0.99) if k == "lion" else (0.9, 0.999)
    if k == "adamw":
        tx = optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                         weight_decay=weight_decay)
    elif k == "adafactor":
        # multiply_by_parameter_scale=False: honor the configured lr/schedule
        # exactly like the other families (True rescales per-param and wants
        # the relative-step heuristics instead of an explicit schedule)
        tx = optax.adafactor(learning_rate=lr,
                             multiply_by_parameter_scale=False,
                             weight_decay_rate=weight_decay or None)
    elif k == "lion":
        tx = optax.lion(lr, b1=betas[0], b2=betas[1],
                        weight_decay=weight_decay)
    elif k == "sgd":
        # true decoupled decay (SGDW): the decay term is added AFTER the
        # momentum accumulator so it never enters the velocity, then both are
        # scaled by the lr — matching the 'decoupled' docstring above
        tx = optax.chain(optax.trace(decay=betas[0], nesterov=True),
                         optax.add_decayed_weights(weight_decay),
                         optax.scale_by_learning_rate(lr))
    else:
        raise ValueError(f"unknown optimizer type {kind!r} "
                         "(expected adamw|adafactor|lion|sgd)")
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if trainable_filter is not None:
        # mask AFTER adamw so frozen params see neither gradients nor weight decay
        tx = optax.chain(tx, freeze_mask_transform(trainable_filter))
    if ema_decay:
        # LAST in the chain: the EMA must see the final (clipped, masked)
        # updates so it tracks the params the step actually applies
        tx = optax.chain(tx, ema_of_params(ema_decay))
    return tx


class EmaState(NamedTuple):
    """Post-update parameter EMA, carried inside the optimizer state so it
    checkpoints, restores, and shards (fsdp/zero1 path-suffix matching in
    parallel/sharding.opt_state_template_shardings) with zero extra wiring."""
    ema: Any


def ema_of_params(decay: float) -> optax.GradientTransformation:
    """Maintain `ema ← decay·ema + (1-decay)·(params + updates)` as optimizer
    state. Updates pass through unchanged, so this transform composes at the
    end of any chain. The EMA tracks POST-update params (what the step is
    about to apply via optax.apply_updates), initialised to a copy of the
    initial params. Beyond the reference (which has no EMA); standard recipe
    for contrastive pretraining eval/export stability."""
    if not (0.0 < decay < 1.0):
        raise ValueError(f"ema_decay must be in (0, 1), got {decay}")

    def init_fn(params):
        # a REAL copy: jnp.asarray would alias the param buffers, and the
        # donated train step may not donate the same buffer twice
        return EmaState(jax.tree_util.tree_map(
            lambda p: jax.numpy.array(p, copy=True), params))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("ema_of_params requires params in optimizer.update")
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
            state.ema, new_params)
        return updates, EmaState(ema)

    return optax.GradientTransformation(init_fn, update_fn)


def find_ema(opt_state) -> Optional[Any]:
    """Extract the EMA param tree from a (possibly nested) optax state, or
    None when the optimizer was built without ema_decay."""
    if isinstance(opt_state, EmaState):
        return opt_state.ema
    if isinstance(opt_state, tuple):
        for sub in opt_state:
            hit = find_ema(sub)
            if hit is not None:
                return hit
    return None


def freeze_mask_transform(trainable_filter) -> optax.GradientTransformation:
    """Zero the gradients of frozen params. trainable_filter(path_tuple) → bool."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def walk(tree, path):
            if isinstance(tree, dict):
                return {k: walk(v, path + (k,)) for k, v in tree.items()}
            return tree if trainable_filter(path) else jax.numpy.zeros_like(tree)

        return walk(updates, ()), state

    return optax.GradientTransformation(init_fn, update_fn)


def exclude_subtrees(base_filter, roots: Tuple[str, ...]):
    """Compose a trainable filter that additionally freezes whole top-level
    param subtrees (e.g. an object tower no training loss consumes)."""

    def f(path: Tuple[str, ...]) -> bool:
        if len(path) > 0 and path[0] in roots:
            return False
        return True if base_filter is None else base_filter(path)

    return f


def linear_probe_filter(path: Tuple[str, ...]) -> bool:
    """Train only the contrastive projection heads. Reference forzen_param
    unfreezes names CONTAINING 'txt_proj' or 'vid_proj' (utils/param_forzen.py)
    — i.e. txt_proj / txt_proj_2 / vid_proj, but NOT the local or object
    heads (txt_local_proj / vid_local_proj / obj_proj stay frozen)."""
    return len(path) > 0 and ("txt_proj" in path[0] or "vid_proj" in path[0])
