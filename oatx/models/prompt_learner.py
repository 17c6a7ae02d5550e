"""CoOp-style learnable prompt contexts for zero-shot classification.

The reference ships a PromptLearner (model/prompt_learner.py:9-96) that is
broken (undefined `prompt_prefix`/`dtype`) and unused by any entry point
(SURVEY.md §2). Two working equivalents live here:

  * class_embeddings — over the oatx DistilBERT text tower: N learnable
    context vectors spliced between [CLS] and each class name's token
    embeddings, CLS output scores classes;
  * clip_class_embeddings — the upstream CLIP-backed design, now runnable
    with the first-party CLIP text encoder (oatx.models.clip_text): learned
    context replaces the 'X' placeholder embeddings, EOT-pooled CLIP
    embedding scores classes (reference prompt_learner.py:18-29,73-96).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from oatx.core.module import Params, trunc_normal
from oatx.models import distilbert as dbert
from oatx.ops.layers import embedding_lookup, layer_norm


@dataclasses.dataclass(frozen=True)
class PromptConfig:
    n_ctx: int = 8
    max_name_tokens: int = 8


def init(rng: jax.Array, text_cfg: dbert.DistilBertConfig,
         cfg: PromptConfig = PromptConfig()) -> Params:
    return {"ctx": trunc_normal(rng, (cfg.n_ctx, text_cfg.dim), std=0.02)}


def encode_class_names(
    tokenizer, class_names: Sequence[str], cfg: PromptConfig
) -> jnp.ndarray:
    """Class names → fixed-size token-id matrix (pad with pad_id)."""
    import numpy as np

    ids = np.full((len(class_names), cfg.max_name_tokens), tokenizer.pad_id, np.int32)
    for i, name in enumerate(class_names):
        toks = tokenizer.encode(name, add_special_tokens=False)[: cfg.max_name_tokens]
        ids[i, : len(toks)] = toks
    return jnp.asarray(ids)


def class_embeddings(
    prompt_params: Params,
    text_params: Params,
    text_cfg: dbert.DistilBertConfig,
    name_token_ids: jnp.ndarray,
    cls_id: int,
    pad_id: int,
    cfg: PromptConfig = PromptConfig(),
) -> jnp.ndarray:
    """→ (num_classes, dim) prompt-conditioned class embeddings.

    Sequence per class: [CLS] ⊕ ctx₁..ctx_N ⊕ name tokens. Positions/LN follow
    the standard embedding path; padding name tokens are masked out."""
    n_cls, n_name = name_token_ids.shape
    emb = text_params["embeddings"]
    cls_vec = emb["word"][cls_id][None, None, :]                 # (1,1,D)
    cls_vec = jnp.broadcast_to(cls_vec, (n_cls, 1, emb["word"].shape[1]))
    ctx = jnp.broadcast_to(prompt_params["ctx"][None],
                           (n_cls, cfg.n_ctx, emb["word"].shape[1]))
    name_vecs = embedding_lookup(emb["word"], name_token_ids)    # (C, n_name, D)
    seq = jnp.concatenate([cls_vec, ctx, name_vecs], axis=1)
    t = seq.shape[1]
    seq = seq + emb["position"][:t][None]
    x = layer_norm(emb["ln"], seq, dbert.LN_EPS)

    mask = jnp.concatenate([
        jnp.ones((n_cls, 1 + cfg.n_ctx), jnp.int32),
        (name_token_ids != pad_id).astype(jnp.int32),
    ], axis=1)

    def body(xx, lp):
        return dbert._layer_apply(text_cfg, lp, xx, mask), None

    x, _ = jax.lax.scan(body, x, text_params["layers"])
    return x[:, 0]


def clip_tokenized_prompts(clip_tokenizer, class_names: Sequence[str],
                           n_ctx: int, context_length: int = 77) -> jnp.ndarray:
    """Tokenize 'X X … X <classname>' per class (reference
    prompt_learner.py:60,77-78: prompt_prefix = n_ctx 'X' placeholders whose
    embeddings get replaced by the learned context)."""
    prefix = " ".join(["X"] * n_ctx)
    return jnp.asarray(clip_tokenizer.tokenize(
        [f"{prefix} {n}" for n in class_names], context_length=context_length,
        truncate=True))


def clip_class_embeddings(
    prompt_params: Params,
    clip_params: Params,
    clip_cfg,
    tokenized_prompts: jnp.ndarray,
    n_ctx: int,
) -> jnp.ndarray:
    """CLIP-backed CoOp (the upstream design, working): splice the learned
    context vectors over the placeholder positions [1, 1+n_ctx) of each
    prompt's token embeddings (reference prompt_learner.py:79-96), run the
    frozen CLIP text transformer, EOT-pool @ text_projection
    (prompt_learner.py:18-29) → (num_classes, embed_dim).

    prompt_params['ctx'] must be (n_ctx, clip_cfg.width) — init with
    init(rng, ...) passing a config whose dim == clip_cfg.width, or any
    (n_ctx, width) array."""
    from oatx.models import clip_text as ct

    n_cls = tokenized_prompts.shape[0]
    emb = embedding_lookup(clip_params["token_embedding"], tokenized_prompts)
    ctx = jnp.broadcast_to(prompt_params["ctx"][None],
                           (n_cls, n_ctx, emb.shape[-1])).astype(emb.dtype)
    emb = jnp.concatenate([emb[:, :1], ctx, emb[:, 1 + n_ctx:]], axis=1)
    return ct.encode_text(clip_params, clip_cfg, tokenized_prompts,
                          inputs_embeds=emb)


def classify(
    image_embeds: jnp.ndarray, class_embeds: jnp.ndarray, temperature: float = 0.05
) -> jnp.ndarray:
    """Cosine-similarity logits (B, num_classes) / temperature."""
    from oatx.losses.contrastive import l2_normalize

    a = l2_normalize(image_embeds)
    b = l2_normalize(class_embeds)
    return (a @ b.T) / temperature
