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


def _pair_loss(sims: jnp.ndarray, loss_cfg: LossConfig) -> jnp.ndarray:
    if loss_cfg.name == "NormSoftmaxLoss":
        return C.norm_softmax_loss(sims, loss_cfg.temperature)
    if loss_cfg.name == "MaxMarginRankingLoss":
        return C.max_margin_ranking_loss(sims, loss_cfg.margin)
    raise ValueError(f"unknown loss {loss_cfg.name!r}")


def loss_fn(
    params: Params,
    cfg: towers.TowerConfig,
    loss_cfg: LossConfig,
    batch: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    if cfg.variant == "baseline":
        text_e, video_e = towers.forward_baseline(params, cfg, batch)
        loss = _pair_loss(C.sim_matrix(text_e, video_e), loss_cfg)
        return loss, {"loss": loss}
    if cfg.variant == "global_local":
        out = towers.forward_global_local(params, cfg, batch)
        l_st2sv = _pair_loss(C.sim_matrix(out["text_embeds"], out["video_embeds"]), loss_cfg)
        l_lt2sv = _pair_loss(C.sim_matrix(out["pad_text_embeds"], out["video_embeds"]), loss_cfg)
        l_fine = C.fine_grained_region_tag_loss(
            out["region_feat"], out["tags_feat"], loss_cfg.temperature)
        loss = l_st2sv + l_lt2sv + l_fine
        return loss, {"loss": loss, "loss_st2sv": l_st2sv, "loss_lt2sv": l_lt2sv,
                      "loss_fine": l_fine}
    if cfg.variant == "region_mem":
        out = towers.forward_region_mem(params, cfg, batch)
        l_nce = _pair_loss(C.sim_matrix(out["text_embeds"], out["video_embeds"]), loss_cfg)
        l_region = C.sigmoid_binary_cross_entropy(
            out["region_sim_logits"], batch["patch_masks"])
        loss = l_nce + loss_cfg.region_bce_weight * l_region
        return loss, {"loss": loss, "loss_nce": l_nce, "loss_region": l_region}
    raise ValueError(f"unknown variant {cfg.variant!r}")


def make_train_step(
    cfg: towers.TowerConfig,
    loss_cfg: LossConfig,
    optimizer: optax.GradientTransformation,
    donate: bool = True,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted train step. State is donated (params updated in place in
    HBM). Shard the batch over the mesh's data axis before calling."""

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, cfg, loss_cfg, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg: towers.TowerConfig) -> Callable:
    """Jitted embedding step for validation/retrieval eval: returns the embeddings
    (host gathers and computes metrics — reference _valid_epoch semantics)."""

    def step(params: Params, batch: Dict[str, jnp.ndarray]):
        out = towers.forward(params, cfg, batch)
        if cfg.variant == "baseline":
            text_e, video_e = out
            return {"text_embeds": text_e, "video_embeds": video_e}
        return {k: v for k, v in out.items() if k.endswith("_embeds")}

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
