"""Object-feature tower: BUTD region features → shared embedding space.

Reference intent vs reality: the reference's `compute_object`
(/root/reference/OATrans/model/oa_model.py:125-127) calls `self.object_model`,
which is NEVER assigned anywhere in the class — and the architecture it names
elsewhere (`SpaceTimeObjectTransformer`, oa_model.py:30) is an undefined
symbol. The stream-3 eval path (test.py:280-291: o2v / o2t similarity streams)
therefore cannot run upstream. This module is oatx's WORKING designed
equivalent (documented design call, PARITY.md): a small transformer encoder
over the (B, K, 2054) object features — 2048-d ROI appearance + 6-d box
geometry as assembled by oatx.data.objects.read_object_features, matching the
reference's on-disk layout (base_dataset.py:564-778) — with zero-padded object
slots masked out, attention-pooled and projected into the shared 256-d space.

TPU notes: identical encoder blocks stacked on a depth axis (scanned or
unrolled like the other towers); K is tiny (≤10) so this is negligible
compute — it exists for parity of capability, not throughput.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from oatx.core.module import Params, stack_params, trunc_normal
from oatx.ops.attention import full_attention
from oatx.ops.layers import layer_norm, linear, mlp

LN_EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class ObjectTowerConfig:
    feature_dim: int = 2054     # 2048 ROI + 6 box geometry
    dim: int = 512
    n_layers: int = 2
    n_heads: int = 8
    hidden_dim: int = 1024
    top_k: int = 10             # max objects per sample


def _init_layer(rng: jax.Array, cfg: ObjectTowerConfig) -> Params:
    rs = jax.random.split(rng, 4)
    d = cfg.dim
    ln = lambda: {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}
    return {
        "norm1": ln(),
        "norm2": ln(),
        "attn": {
            "qkv": {"kernel": trunc_normal(rs[0], (d, 3 * d)),
                    "bias": jnp.zeros((3 * d,))},
            "proj": {"kernel": trunc_normal(rs[1], (d, d)),
                     "bias": jnp.zeros((d,))},
        },
        "mlp": {
            "fc1": {"kernel": trunc_normal(rs[2], (d, cfg.hidden_dim)),
                    "bias": jnp.zeros((cfg.hidden_dim,))},
            "fc2": {"kernel": trunc_normal(rs[3], (cfg.hidden_dim, d)),
                    "bias": jnp.zeros((d,))},
        },
    }


def init(rng: jax.Array, cfg: ObjectTowerConfig) -> Params:
    rs = jax.random.split(rng, cfg.n_layers + 3)
    return {
        "embed": {"kernel": trunc_normal(rs[0], (cfg.feature_dim, cfg.dim)),
                  "bias": jnp.zeros((cfg.dim,))},
        "embed_norm": {"scale": jnp.ones((cfg.dim,)),
                       "bias": jnp.zeros((cfg.dim,))},
        "layers": stack_params([_init_layer(r, cfg)
                                for r in rs[1: 1 + cfg.n_layers]]),
        "norm": {"scale": jnp.ones((cfg.dim,)), "bias": jnp.zeros((cfg.dim,))},
        "pool_query": trunc_normal(rs[-1], (1, 1, cfg.dim)),
    }


def apply(params: Params, cfg: ObjectTowerConfig, objects: jnp.ndarray,
          dtype=jnp.float32) -> jnp.ndarray:
    """objects (B, K, feature_dim) → pooled (B, dim).

    All-zero object rows (the loader's padding for samples with fewer than
    top_k detections) are masked out of attention and pooling; a sample with
    no objects at all degenerates to the pool query's bias direction.
    """
    x = objects.astype(dtype)
    mask = (jnp.max(jnp.abs(x), axis=-1) > 0).astype(jnp.int32)   # (B, K)
    # a sample with zero detections would make every attention row fully
    # masked (NaN softmax) — unmask its (all-zero) rows instead
    empty = (jnp.sum(mask, axis=-1, keepdims=True) == 0).astype(jnp.int32)
    mask = jnp.maximum(mask, empty)
    x = linear(params["embed"], x)
    x = layer_norm(params["embed_norm"], x, LN_EPS)

    def body(xx, lp):
        a = full_attention(lp["attn"], layer_norm(lp["norm1"], xx, LN_EPS),
                           cfg.n_heads, mask=mask)
        xx = xx + a
        return xx + mlp(lp["mlp"], layer_norm(lp["norm2"], xx, LN_EPS)), None

    for i in range(cfg.n_layers):
        lp = jax.tree_util.tree_map(lambda a: a[i], params["layers"])
        x, _ = body(x, lp)
    x = layer_norm(params["norm"], x, LN_EPS)

    # masked attention pooling against a learned query (design call — the
    # reference never shipped a working pooling; mean over valid slots is the
    # degenerate case when the query is uninformative)
    q = params["pool_query"].astype(x.dtype)                      # (1, 1, D)
    logits = jnp.einsum("bkd,11d->bk", x, q) / (cfg.dim ** 0.5)
    logits = jnp.where(mask > 0, logits, jnp.finfo(jnp.float32).min)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    return jnp.einsum("bk,bkd->bd", w, x)
