"""CLIP text transformer (JAX) — first-party equivalent of the reference's
vendored CLIP text side (`Visualization/.../clip/model.py:160-363`) and the
text encoder the region-memory bank and CoOp prompt learner are defined over
(`OATrans/base/base_dataset_region_mem.py:297-305`,
`OATrans/model/prompt_learner.py:9-29`).

Behavioral spec (golden-tested vs the reference module itself in
tests/test_clip_text.py):
  * token embedding + learned positional embedding over context 77
    (model.py:291-293, 345-348);
  * pre-LN residual blocks: x += MHA(ln_1(x)) with a CAUSAL mask,
    x += MLP(ln_2(x)) with QuickGELU (x·sigmoid(1.702x)) — model.py:160-186,
    330-336;
  * ln_final, then either
      - `encode_text`: pool the EOT position (argmax of ids — eot has the
        highest id) @ text_projection → (B, embed_dim), the standard CLIP
        embedding the 512-d memory bank rows are (prompt_learner.py:27),
      - `encode_text_tokens`: ALL tokens @ text_projection, L2-normalized —
        the visualization sidecar's per-token variant (model.py:345-363).

TPU-first notes: qkv is one fused (D,3D) matmul (vs torch's in_proj), blocks
are stacked on a leading depth axis (scan-able), LN/softmax statistics run in
f32 at any compute dtype (oatx conventions), and the causal mask is additive
f32 — XLA folds it into the attention logits.

Weight import from an OpenAI/vendored-CLIP torch state_dict:
oatx.models.convert.clip_text_from_torch.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from oatx.core.module import Params, stack_params
from oatx.ops.layers import embedding_lookup, layer_norm, linear

LN_EPS = 1e-5  # torch nn.LayerNorm default (vendored LayerNorm subclass)


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512
    scan_layers: bool = False


def _init_block(rng: jax.Array, cfg: ClipTextConfig) -> Params:
    """Reference init distribution (model.py:316-324): attn/out/fc scaled
    normals; biases zero; LN affine identity."""
    rs = jax.random.split(rng, 4)
    d = cfg.width
    proj_std = (d ** -0.5) * ((2 * cfg.layers) ** -0.5)
    attn_std = d ** -0.5
    fc_std = (2 * d) ** -0.5
    ln = lambda: {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}
    return {
        "ln_1": ln(),
        "attn": {
            "qkv": {"kernel": jax.random.normal(rs[0], (d, 3 * d)) * attn_std,
                    "bias": jnp.zeros((3 * d,))},
            "out": {"kernel": jax.random.normal(rs[1], (d, d)) * proj_std,
                    "bias": jnp.zeros((d,))},
        },
        "ln_2": ln(),
        "mlp": {
            "fc1": {"kernel": jax.random.normal(rs[2], (d, 4 * d)) * fc_std,
                    "bias": jnp.zeros((4 * d,))},
            "fc2": {"kernel": jax.random.normal(rs[3], (4 * d, d)) * proj_std,
                    "bias": jnp.zeros((d,))},
        },
    }


def init(rng: jax.Array, cfg: ClipTextConfig) -> Params:
    rs = jax.random.split(rng, cfg.layers + 3)
    d = cfg.width
    return {
        "token_embedding": jax.random.normal(rs[0], (cfg.vocab_size, d)) * 0.02,
        "positional_embedding": jax.random.normal(rs[1], (cfg.context_length, d)) * 0.01,
        "blocks": stack_params([_init_block(r, cfg) for r in rs[2:-1]]),
        "ln_final": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "text_projection": jax.random.normal(rs[-1], (d, cfg.embed_dim)) * (d ** -0.5),
    }


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x · σ(1.702x) (model.py:160-162) — NOT the exact-erf GELU the ViT uses."""
    return x * jax.nn.sigmoid(1.702 * x)


def _causal_attn(ap: Params, x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    dh = d // heads
    qkv = linear(ap["qkv"], x).reshape(b, t, 3, heads, dh)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * (dh ** -0.5), k,
                        preferred_element_type=jnp.float32)
    # additive causal mask (model.py:330-336): -inf above the diagonal
    neg = jnp.finfo(jnp.float32).min
    causal = jnp.tril(jnp.ones((t, t), bool))
    logits = jnp.where(causal[None, None], logits, neg)
    p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, t, d)
    return linear(ap["out"], out)


def _block_apply(cfg: ClipTextConfig, bp: Params, x: jnp.ndarray) -> jnp.ndarray:
    x = x + _causal_attn(bp["attn"], layer_norm(bp["ln_1"], x, LN_EPS), cfg.heads)
    h = layer_norm(bp["ln_2"], x, LN_EPS)
    return x + linear(bp["mlp"]["fc2"], quick_gelu(linear(bp["mlp"]["fc1"], h)))


def apply(params: Params, cfg: ClipTextConfig, ids: jnp.ndarray,
          dtype=jnp.float32,
          inputs_embeds: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """→ ln_final hidden states (B, T, D). `inputs_embeds` overrides the token
    embedding lookup (the CoOp prompt learner splices learned context vectors
    into the embedding sequence — prompt_learner.py:79-96)."""
    b, t = ids.shape
    assert t <= cfg.context_length
    if inputs_embeds is None:
        x = embedding_lookup(params["token_embedding"], ids)
    else:
        x = inputs_embeds
    x = (x + params["positional_embedding"][:t][None]).astype(dtype)
    if cfg.scan_layers:
        x, _ = jax.lax.scan(lambda xx, bp: (_block_apply(cfg, bp, xx), None),
                            x, params["blocks"])
    else:
        for i in range(cfg.layers):
            bp = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
            x = _block_apply(cfg, bp, x)
    return layer_norm(params["ln_final"], x, LN_EPS)


def encode_text(params: Params, cfg: ClipTextConfig, ids: jnp.ndarray,
                dtype=jnp.float32,
                inputs_embeds: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Standard CLIP text embedding: EOT-pooled @ text_projection → (B, E).
    EOT position = argmax(ids) since <|endoftext|> carries the highest id
    (prompt_learner.py:27; OpenAI CLIP semantics)."""
    h = apply(params, cfg, ids, dtype, inputs_embeds)
    eot = jnp.argmax(ids, axis=-1)
    pooled = jnp.take_along_axis(h, eot[:, None, None], axis=1)[:, 0]
    return pooled @ params["text_projection"].astype(pooled.dtype)


def encode_text_tokens(params: Params, cfg: ClipTextConfig, ids: jnp.ndarray,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Visualization-sidecar variant (model.py:345-363): EVERY token projected
    and L2-normalized → (B, T, E)."""
    h = apply(params, cfg, ids, dtype)
    x = h @ params["text_projection"].astype(h.dtype)
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)
