"""DistilBERT text tower (JAX).

Matches HuggingFace `DistilBertModel` (the reference's text tower,
/root/reference/OATrans/model/model.py:26,103-112) numerically: learned word +
position embeddings with LayerNorm(eps=1e-12), 6 post-LN transformer layers
(MHA → residual → LN → FFN(GELU) → residual → LN), attention mask with 1 = attend.

Blocks are stacked and scanned (see oatx.models.vit_spacetime for rationale).
Weight import from a torch DistilBERT state_dict lives in oatx.models.convert.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from oatx.core.module import Params, stack_params, trunc_normal
from oatx.ops.attention import full_attention
from oatx.ops.layers import embedding_lookup, gelu, layer_norm, linear

LN_EPS = 1e-12


@dataclasses.dataclass(frozen=True)
class DistilBertConfig:
    vocab_size: int = 30522
    max_position_embeddings: int = 512
    dim: int = 768
    hidden_dim: int = 3072
    n_layers: int = 6
    n_heads: int = 12
    scan_layers: bool = False  # unrolled is faster on TPU (see vit_spacetime)


def _init_layer(rng: jax.Array, cfg: DistilBertConfig) -> Params:
    rs = jax.random.split(rng, 6)
    d, h = cfg.dim, cfg.hidden_dim
    ln = lambda: {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}
    dense = lambda r, i, o: {"kernel": trunc_normal(r, (i, o)), "bias": jnp.zeros((o,))}
    return {
        "attn": {
            "q": dense(rs[0], d, d),
            "k": dense(rs[1], d, d),
            "v": dense(rs[2], d, d),
            "out": dense(rs[3], d, d),
        },
        "sa_ln": ln(),
        "ffn": {"lin1": dense(rs[4], d, h), "lin2": dense(rs[5], h, d)},
        "out_ln": ln(),
    }


def init(rng: jax.Array, cfg: DistilBertConfig) -> Params:
    rs = jax.random.split(rng, cfg.n_layers + 2)
    return {
        "embeddings": {
            "word": trunc_normal(rs[0], (cfg.vocab_size, cfg.dim)),
            "position": trunc_normal(rs[1], (cfg.max_position_embeddings, cfg.dim)),
            "ln": {"scale": jnp.ones((cfg.dim,)), "bias": jnp.zeros((cfg.dim,))},
        },
        "layers": stack_params([_init_layer(r, cfg) for r in rs[2:]]),
    }


def _mha(lp: Params, x: jnp.ndarray, mask: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    dh = d // n_heads
    q = linear(lp["q"], x).reshape(b, t, n_heads, dh) * (dh ** -0.5)
    k = linear(lp["k"], x).reshape(b, t, n_heads, dh)
    v = linear(lp["v"], x).reshape(b, t, n_heads, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    neg = jnp.finfo(jnp.float32).min
    logits = jnp.where(mask[:, None, None, :].astype(bool), logits, neg)
    p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32)
    return linear(lp["out"], out.reshape(b, t, d).astype(x.dtype))


def _layer_apply(cfg: DistilBertConfig, lp: Params, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    a = _mha(lp["attn"], x, mask, cfg.n_heads)
    x = layer_norm(lp["sa_ln"], x + a, LN_EPS)
    f = linear(lp["ffn"]["lin2"], gelu(linear(lp["ffn"]["lin1"], x)))
    return layer_norm(lp["out_ln"], x + f, LN_EPS)


def apply(
    params: Params,
    cfg: DistilBertConfig,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """→ last_hidden_state (B, T, D). CLS embedding = [:, 0]."""
    b, t = input_ids.shape
    assert t <= cfg.max_position_embeddings, (
        f"sequence length {t} > max_position_embeddings "
        f"{cfg.max_position_embeddings}")
    if attention_mask is None:
        attention_mask = jnp.ones((b, t), jnp.int32)
    emb = params["embeddings"]
    pos = emb["position"][:t][None]
    x = embedding_lookup(emb["word"], input_ids) + pos
    x = layer_norm(emb["ln"], x, LN_EPS).astype(dtype)

    if cfg.scan_layers:
        def body(xx, lp):
            return _layer_apply(cfg, lp, xx, attention_mask), None

        x, _ = jax.lax.scan(body, x, params["layers"])
    else:
        for i in range(cfg.n_layers):
            lp = jax.tree_util.tree_map(lambda a: a[i], params["layers"])
            x = _layer_apply(cfg, lp, x, attention_mask)
    return x


def cls_embedding(params: Params, cfg: DistilBertConfig, input_ids, attention_mask=None, dtype=jnp.float32):
    return apply(params, cfg, input_ids, attention_mask, dtype)[:, 0]
