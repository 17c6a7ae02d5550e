"""BERT text tower (JAX) — the reference's alternative text model.

The reference dispatches on the model-name prefix: 'bert*' uses BertModel's
pooler_output (model.py:104-106), 'distilbert*' uses the CLS hidden state. This
implements HF BertModel numerics: word+position+token-type embeddings with
LayerNorm(1e-12), post-LN encoder layers (self-attention → Add&LN → intermediate
GELU → output → Add&LN), and the tanh pooler over CLS.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from oatx.core.module import Params, stack_params, trunc_normal
from oatx.ops.layers import embedding_lookup, gelu, layer_norm, linear

LN_EPS = 1e-12


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    dim: int = 768
    hidden_dim: int = 3072
    n_layers: int = 12
    n_heads: int = 12
    scan_layers: bool = False  # unrolled is faster on TPU (see vit_spacetime)


def _init_layer(rng: jax.Array, cfg: BertConfig) -> Params:
    rs = jax.random.split(rng, 6)
    d, hdim = cfg.dim, cfg.hidden_dim
    ln = lambda: {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}
    dense = lambda r, i, o: {"kernel": trunc_normal(r, (i, o)), "bias": jnp.zeros((o,))}
    return {
        "attn": {"q": dense(rs[0], d, d), "k": dense(rs[1], d, d),
                 "v": dense(rs[2], d, d), "out": dense(rs[3], d, d)},
        "attn_ln": ln(),
        "intermediate": dense(rs[4], d, hdim),
        "output": dense(rs[5], hdim, d),
        "out_ln": ln(),
    }


def init(rng: jax.Array, cfg: BertConfig) -> Params:
    rs = jax.random.split(rng, cfg.n_layers + 4)
    return {
        "embeddings": {
            "word": trunc_normal(rs[0], (cfg.vocab_size, cfg.dim)),
            "position": trunc_normal(rs[1], (cfg.max_position_embeddings, cfg.dim)),
            "token_type": trunc_normal(rs[2], (cfg.type_vocab_size, cfg.dim)),
            "ln": {"scale": jnp.ones((cfg.dim,)), "bias": jnp.zeros((cfg.dim,))},
        },
        "layers": stack_params([_init_layer(r, cfg) for r in rs[3: 3 + cfg.n_layers]]),
        "pooler": {"kernel": trunc_normal(rs[-1], (cfg.dim, cfg.dim)),
                   "bias": jnp.zeros((cfg.dim,))},
    }


def _mha(lp: Params, x: jnp.ndarray, mask: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    dh = d // n_heads
    q = linear(lp["q"], x).reshape(b, t, n_heads, dh) * (dh ** -0.5)
    k = linear(lp["k"], x).reshape(b, t, n_heads, dh)
    v = linear(lp["v"], x).reshape(b, t, n_heads, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = jnp.where(mask[:, None, None, :].astype(bool), logits,
                       jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32)
    return linear(lp["out"], out.reshape(b, t, d).astype(x.dtype))


def apply(
    params: Params,
    cfg: BertConfig,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    token_type_ids: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
):
    """→ (last_hidden_state (B,T,D), pooler_output (B,D))."""
    b, t = input_ids.shape
    assert t <= cfg.max_position_embeddings, (
        f"sequence length {t} > max_position_embeddings "
        f"{cfg.max_position_embeddings}")
    if attention_mask is None:
        attention_mask = jnp.ones((b, t), jnp.int32)
    if token_type_ids is None:
        token_type_ids = jnp.zeros((b, t), jnp.int32)
    emb = params["embeddings"]
    x = (embedding_lookup(emb["word"], input_ids)
         + emb["position"][:t][None]
         + embedding_lookup(emb["token_type"], token_type_ids))
    x = layer_norm(emb["ln"], x, LN_EPS).astype(dtype)

    def layer(lp, xx):
        a = _mha(lp["attn"], xx, attention_mask, cfg.n_heads)
        xx = layer_norm(lp["attn_ln"], xx + a, LN_EPS)
        f = linear(lp["output"], gelu(linear(lp["intermediate"], xx)))
        return layer_norm(lp["out_ln"], xx + f, LN_EPS)

    if cfg.scan_layers:
        x, _ = jax.lax.scan(lambda xx, lp: (layer(lp, xx), None), x, params["layers"])
    else:
        for i in range(cfg.n_layers):
            lp = jax.tree_util.tree_map(lambda a: a[i], params["layers"])
            x = layer(lp, x)
    pooled = jnp.tanh(linear(params["pooler"], x[:, 0].astype(jnp.float32)))
    return x, pooled


def bert_from_torch(state_dict, cfg: Optional[BertConfig] = None) -> Params:
    """HF BertModel state_dict → param tree (strips 'bert.'/'text_model.' prefix)."""
    import numpy as np

    from oatx.models.convert import _dense, _ln, strip_data_parallel_prefix

    cfg = cfg or BertConfig()
    sd = strip_data_parallel_prefix(state_dict)
    for pfx in ("bert.", "text_model."):
        if any(k.startswith(pfx + "embeddings") for k in sd):
            sd = {k[len(pfx):]: v for k, v in sd.items() if k.startswith(pfx)}
            break
    layers = []
    for i in range(cfg.n_layers):
        p = f"encoder.layer.{i}"
        layers.append({
            "attn": {
                "q": _dense(sd, f"{p}.attention.self.query"),
                "k": _dense(sd, f"{p}.attention.self.key"),
                "v": _dense(sd, f"{p}.attention.self.value"),
                "out": _dense(sd, f"{p}.attention.output.dense"),
            },
            "attn_ln": _ln(sd, f"{p}.attention.output.LayerNorm"),
            "intermediate": _dense(sd, f"{p}.intermediate.dense"),
            "output": _dense(sd, f"{p}.output.dense"),
            "out_ln": _ln(sd, f"{p}.output.LayerNorm"),
        })
    return {
        "embeddings": {
            "word": jnp.asarray(sd["embeddings.word_embeddings.weight"]),
            "position": jnp.asarray(sd["embeddings.position_embeddings.weight"]),
            "token_type": jnp.asarray(sd["embeddings.token_type_embeddings.weight"]),
            "ln": _ln(sd, "embeddings.LayerNorm"),
        },
        "layers": stack_params(layers),
        "pooler": _dense(sd, "pooler.dense"),
    }
