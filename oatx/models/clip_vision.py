"""CLIP vision transformer (JAX) — first-party equivalent of the reference's
vendored CLIP visual side (`Visualization/.../clip/model.py:203-243`), the one
backbone option of the visualization sidecar oatx could not previously serve
(its drivers select `model_se='clip'` in `main_img.py:12,17-27`).

Behavioral spec (golden-tested vs the reference module itself in
tests/test_clip_vision.py):
  * patch conv (no bias) → flatten → prepend class embedding → add learned
    positional embedding → ln_pre (model.py:222-228);
  * pre-LN residual blocks identical to the text side but with UNMASKED
    self-attention and QuickGELU (model.py:167-189);
  * two heads over the final hidden states:
      - `encode_image`: stock CLIP pooling — ln_post(x[:, 0]) @ proj → (B, E)
        (the upstream OpenAI behavior the vendored copy comments out,
        model.py:234-238);
      - `encode_image_patches`: the vendored viz forward — ln_post over ALL
        patch tokens (CLS dropped) @ proj, L2-normalized → (B, N, E)
        (model.py:233-242) — what `cross_attention_visualize` consumes.

TPU-first notes: NHWC images / HWIO conv kernel (oatx convention), fused
(D,3D) qkv matmul, blocks stacked on a leading depth axis (scan-able), LN and
softmax statistics in f32 at any compute dtype.

Weight import from an OpenAI/vendored-CLIP torch state_dict:
oatx.models.convert.clip_vision_from_torch.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from oatx.core.module import Params, stack_params
from oatx.models.clip_text import LN_EPS, quick_gelu
from oatx.ops.layers import layer_norm, linear


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    input_resolution: int = 224
    patch_size: int = 16
    width: int = 768
    heads: int = 12
    layers: int = 12
    output_dim: int = 512
    scan_layers: bool = False

    @property
    def grid(self) -> int:
        return self.input_resolution // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid ** 2


def _init_block(rng: jax.Array, cfg: ClipVisionConfig) -> Params:
    """Reference init distribution (model.py:316-324), parameterized by the
    visual width/depth."""
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


def init(rng: jax.Array, cfg: ClipVisionConfig) -> Params:
    rs = jax.random.split(rng, cfg.layers + 6)
    d = cfg.width
    scale = d ** -0.5  # model.py:210-214
    ln = lambda: {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}
    return {
        # conv1 has no bias (model.py:208)
        "conv1": {"kernel": jax.random.normal(
            rs[0], (cfg.patch_size, cfg.patch_size, 3, d)) * 0.02},
        "class_embedding": jax.random.normal(rs[1], (d,)) * scale,
        "positional_embedding": jax.random.normal(
            rs[2], (cfg.num_patches + 1, d)) * scale,
        "ln_pre": ln(),
        "blocks": stack_params([_init_block(r, cfg) for r in rs[3:3 + cfg.layers]]),
        "ln_post": ln(),
        "proj": jax.random.normal(rs[-1], (d, cfg.output_dim)) * scale,
    }


def _attn(ap: Params, x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Unmasked MHA — the visual transformer builds no attn_mask
    (model.py:218: Transformer(width, layers, heads) with attn_mask=None)."""
    b, t, d = x.shape
    dh = d // heads
    qkv = linear(ap["qkv"], x).reshape(b, t, 3, heads, dh)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * (dh ** -0.5), k,
                        preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, t, d)
    return linear(ap["out"], out)


def _block_apply(cfg: ClipVisionConfig, bp: Params, x: jnp.ndarray) -> jnp.ndarray:
    x = x + _attn(bp["attn"], layer_norm(bp["ln_1"], x, LN_EPS), cfg.heads)
    h = layer_norm(bp["ln_2"], x, LN_EPS)
    return x + linear(bp["mlp"]["fc2"], quick_gelu(linear(bp["mlp"]["fc1"], h)))


def apply(params: Params, cfg: ClipVisionConfig, images: jnp.ndarray,
          dtype=jnp.float32) -> jnp.ndarray:
    """→ final hidden states (B, 1+N, D), BEFORE ln_post (both pooling heads
    norm their own slice, matching the torch module). images: (B, H, W, 3)
    NHWC, already CLIP-normalized."""
    b = images.shape[0]
    x = jax.lax.conv_general_dilated(
        images.astype(dtype), params["conv1"]["kernel"].astype(dtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(b, cfg.num_patches, cfg.width)
    cls = jnp.broadcast_to(params["class_embedding"].astype(dtype),
                           (b, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(dtype)[None]
    x = layer_norm(params["ln_pre"], x, LN_EPS).astype(dtype)
    if cfg.scan_layers:
        x, _ = jax.lax.scan(lambda xx, bp: (_block_apply(cfg, bp, xx), None),
                            x, params["blocks"])
    else:
        for i in range(cfg.layers):
            bp = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
            x = _block_apply(cfg, bp, x)
    return x


def encode_image(params: Params, cfg: ClipVisionConfig, images: jnp.ndarray,
                 dtype=jnp.float32) -> jnp.ndarray:
    """Stock CLIP image embedding: ln_post(CLS) @ proj → (B, E)."""
    h = apply(params, cfg, images, dtype)
    pooled = layer_norm(params["ln_post"], h[:, 0], LN_EPS)
    return pooled @ params["proj"].astype(pooled.dtype)


def encode_image_patches(params: Params, cfg: ClipVisionConfig,
                         images: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Vendored viz forward (model.py:233-242): ln_post over every PATCH token
    (CLS dropped) @ proj, L2-normalized → (B, N, E)."""
    h = apply(params, cfg, images, dtype)
    x = layer_norm(params["ln_post"], h[:, 1:], LN_EPS)
    x = x @ params["proj"].astype(x.dtype)
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)
