"""Contrastive losses (JAX).

Reference parity:
  * sim_matrix            — /root/reference/OATrans/model/model.py:164-172
  * norm_softmax_loss     — /root/reference/OATrans/model/loss.py:7-25 (NormSoftmaxLoss)
  * max_margin_ranking    — loss.py:28-63
  * nce_softmax_loss      — /root/reference/OATrans/model/oa_loss.py:53-64
  * softmax_kl / mse      — oa_loss.py:16-41
  * MoCo queue            — oa_loss.py:66-143 (functional re-design: queue state is an
                            explicit pytree, updated purely)
  * region BCE            — /root/reference/OATrans/trainer/trainer_region_mem.py:160-167

TPU-first notes: under pjit data parallelism the train step operates on the *global*
batch, so computing the full similarity matrix here IS the reference's cross-replica
all-gather — XLA inserts the gather of the (tiny) 256-d embeddings over ICI and the
backward slice/reduce-scatter comes from AD, exactly matching the semantics of the
reference's differentiable AllGather_multi (trainer_dist.py:29-45). An explicit
`axis_name` path is provided for shard_map-style use.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, eps: float = 1e-8, axis: int = -1) -> jnp.ndarray:
    """x / max(||x||, eps) — matches reference sim_matrix's norm clamping."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def sim_matrix(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Cosine similarity matrix between rows of a (N,D) and b (M,D) → (N,M)."""
    a_n = l2_normalize(a, eps)
    b_n = l2_normalize(b, eps)
    return jnp.matmul(a_n, b_n.T, preferred_element_type=jnp.float32)


def norm_softmax_loss(sims: jnp.ndarray, temperature: float = 0.05) -> jnp.ndarray:
    """Symmetric InfoNCE over a similarity matrix: -mean diag of row log-softmax
    minus mean diag of column log-softmax. Computed in f32 for stability."""
    sims = sims.astype(jnp.float32) / temperature
    i_logsm = jax.nn.log_softmax(sims, axis=1)
    j_logsm = jax.nn.log_softmax(sims.T, axis=1)
    n = min(sims.shape[0], sims.shape[1])
    loss_i = jnp.mean(jnp.diagonal(i_logsm)[:n])
    loss_j = jnp.mean(jnp.diagonal(j_logsm)[:n])
    return -loss_i - loss_j


def norm_softmax_loss_global(
    text_embeds: jnp.ndarray,
    video_embeds: jnp.ndarray,
    temperature: float = 0.05,
    axis_name: Optional[str] = None,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """NormSoftmax with global negatives.

    Under pjit (axis_name=None) the inputs are already the global batch — the
    similarity matrix is the cross-replica one. Under shard_map pass the mesh axis
    name to all-gather both embedding sets (tiled) first; JAX AD yields the gradient
    slice exactly as the reference's AllGather_multi.backward.
    """
    if axis_name is not None:
        text_embeds = jax.lax.all_gather(text_embeds, axis_name, tiled=True)
        video_embeds = jax.lax.all_gather(video_embeds, axis_name, tiled=True)
    return norm_softmax_loss(sim_matrix(text_embeds, video_embeds, eps), temperature)


def norm_softmax_loss_chunked(
    text_embeds: jnp.ndarray,
    video_embeds: jnp.ndarray,
    temperature: float = 0.05,
    chunk: int = 4096,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Memory-efficient NormSoftmax for very large global batches.

    Computes row/column log-normalizers by scanning over key chunks so the full
    B_global × B_global matrix is never materialized (only B × chunk tiles).
    Numerically: two-pass online logsumexp in f32. Equivalent to norm_softmax_loss.
    """
    t = l2_normalize(text_embeds.astype(jnp.float32), eps)
    v = l2_normalize(video_embeds.astype(jnp.float32), eps)
    n = t.shape[0]
    assert v.shape[0] == n, "chunked loss assumes square sims"
    pos = jnp.sum(t * v, axis=-1) / temperature  # diagonal logits

    pad = (-n) % chunk
    v_pad = jnp.pad(v, ((0, pad), (0, 0)))
    t_pad = jnp.pad(t, ((0, pad), (0, 0)))
    n_chunks = (n + pad) // chunk
    v_chunks = v_pad.reshape(n_chunks, chunk, -1)
    t_chunks = t_pad.reshape(n_chunks, chunk, -1)
    base = jnp.arange(chunk)

    def body(carry, inputs):
        m_row, s_row, m_col, s_col = carry
        v_c, t_c, idx = inputs
        valid = (idx * chunk + base) < n  # mask padded keys
        neg_inf = jnp.float32(-jnp.inf)
        # rows: text queries vs video-key chunk
        logits_r = jnp.where(valid[None, :], (t @ v_c.T) / temperature, neg_inf)
        m_new = jnp.maximum(m_row, jnp.max(logits_r, axis=1))
        s_row = s_row * jnp.exp(m_row - m_new) + jnp.sum(
            jnp.exp(logits_r - m_new[:, None]), axis=1)
        m_row = m_new
        # cols: video queries vs text-key chunk
        logits_c = jnp.where(valid[None, :], (v @ t_c.T) / temperature, neg_inf)
        m_newc = jnp.maximum(m_col, jnp.max(logits_c, axis=1))
        s_col = s_col * jnp.exp(m_col - m_newc) + jnp.sum(
            jnp.exp(logits_c - m_newc[:, None]), axis=1)
        m_col = m_newc
        return (m_row, s_row, m_col, s_col), None

    init = (
        jnp.full((n,), -jnp.inf, jnp.float32), jnp.zeros((n,), jnp.float32),
        jnp.full((n,), -jnp.inf, jnp.float32), jnp.zeros((n,), jnp.float32),
    )
    (m_row, s_row, m_col, s_col), _ = jax.lax.scan(
        body, init, (v_chunks, t_chunks, jnp.arange(n_chunks)))
    lse_row = m_row + jnp.log(s_row)
    lse_col = m_col + jnp.log(s_col)
    loss_i = jnp.mean(pos - lse_row)
    loss_j = jnp.mean(pos - lse_col)
    return -loss_i - loss_j


def max_margin_ranking_loss(
    sims: jnp.ndarray, margin: float = 1.0, fix_norm: bool = True
) -> jnp.ndarray:
    """Bidirectional max-margin ranking loss (reference loss.py:28-63)."""
    sims = sims.astype(jnp.float32)
    n = sims.shape[0]
    d = jnp.diagonal(sims)
    x1 = jnp.broadcast_to(d[:, None], (n, n))  # positives, row-major
    hinge_r = jax.nn.relu(margin - (x1 - sims))        # rows direction
    hinge_c = jax.nn.relu(margin - (x1 - sims.T))      # transposed direction
    if fix_norm:
        keep = 1.0 - jnp.eye(n, dtype=sims.dtype)
        total = jnp.sum(hinge_r * keep) + jnp.sum(hinge_c * keep)
        count = 2.0 * jnp.sum(keep)
        return total / count
    return 0.5 * (jnp.mean(hinge_r) + jnp.mean(hinge_c))


def cross_entropy_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean CE with integer targets (reference loss.py:66-72)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=-1))


def nce_softmax_loss(logits: jnp.ndarray) -> jnp.ndarray:
    """CE with the positive at column 0 (reference oa_loss.py:53-64)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(logp[:, 0])


def softmax_kl_loss(input_logits: jnp.ndarray, target_logits: jnp.ndarray) -> jnp.ndarray:
    """Sum KL(softmax(target) || softmax(input)); no gradient to targets."""
    target_logits = jax.lax.stop_gradient(target_logits)
    logp = jax.nn.log_softmax(input_logits.astype(jnp.float32), axis=1)
    q = jax.nn.softmax(target_logits.astype(jnp.float32), axis=1)
    logq = jax.nn.log_softmax(target_logits.astype(jnp.float32), axis=1)
    return jnp.sum(q * (logq - logp))


def softmax_mse_loss(input_logits: jnp.ndarray, target_logits: jnp.ndarray) -> jnp.ndarray:
    """Sum squared error between logits; no gradient to targets."""
    target_logits = jax.lax.stop_gradient(target_logits)
    diff = input_logits.astype(jnp.float32) - target_logits.astype(jnp.float32)
    return jnp.sum(diff * diff)


def binary_cross_entropy(probs: jnp.ndarray, targets: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Mean BCE on probabilities (targets ∈ [0,1]); clamped like torch BCELoss."""
    p = jnp.clip(probs.astype(jnp.float32), eps, 1.0 - eps)
    t = targets.astype(jnp.float32)
    return -jnp.mean(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))


def sigmoid_binary_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable BCE-with-logits (preferred over binary_cross_entropy on TPU;
    fuse the sigmoid into the loss instead of materializing probabilities)."""
    logits = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    return jnp.mean(jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def region_bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Region-map BCE with the reference's reduction: BCELoss(reduction='sum')
    over (B·K, N) rows divided by the row count (trainer_region_mem.py:96,166)
    — i.e. SUM over the patch axis, MEAN over (batch, region) rows. This is
    N× the element mean; using a plain mean under-weights the region gradient
    ~200× at 14×14 grids."""
    logits = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    elem = jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(jnp.sum(elem, axis=-1))


class MoCoQueue(NamedTuple):
    """Functional MoCo negative queue (reference oa_loss.py:66-143 re-designed as an
    explicit state pytree: donate+carry it through the train step)."""

    memory: jnp.ndarray  # (K, D)
    index: jnp.ndarray   # () int32 — next write position


def moco_queue_init(rng: jax.Array, queue_size: int, dim: int) -> MoCoQueue:
    stdv = 1.0 / jnp.sqrt(jnp.float32(dim) / 3.0)
    mem = jax.random.uniform(rng, (queue_size, dim), jnp.float32, -stdv, stdv)
    return MoCoQueue(memory=mem, index=jnp.zeros((), jnp.int32))


def moco_logits(
    q: jnp.ndarray, k: jnp.ndarray, n: jnp.ndarray, queue: MoCoQueue, temperature: float = 0.07
) -> jnp.ndarray:
    """[pos | queue negatives | extra negative] logits / T. k, n are stop-gradiented."""
    k = jax.lax.stop_gradient(k)
    n = jax.lax.stop_gradient(n)
    l_pos = jnp.sum(q * k, axis=-1, keepdims=True)
    l_neg = q @ jax.lax.stop_gradient(queue.memory).T
    l_neg2 = jnp.sum(q * n, axis=-1, keepdims=True)
    return jnp.concatenate([l_pos, l_neg, l_neg2], axis=1) / temperature


def moco_queue_update(queue: MoCoQueue, k: jnp.ndarray) -> MoCoQueue:
    """Ring-buffer write of the batch of keys (reference index_copy_ + fmod)."""
    batch = k.shape[0]
    ids = (jnp.arange(batch, dtype=jnp.int32) + queue.index) % queue.memory.shape[0]
    memory = queue.memory.at[ids].set(jax.lax.stop_gradient(k))
    index = (queue.index + batch) % queue.memory.shape[0]
    return MoCoQueue(memory=memory, index=index)


def fine_grained_region_tag_loss(
    region_embeds: jnp.ndarray,
    tag_embeds: jnp.ndarray,
    temperature: float = 0.05,
) -> jnp.ndarray:
    """Mean-pooled region ↔ mean-pooled tag NCE (the *working* fine-grained loss the
    global-local trainer actually uses — trainer_global_local.py:187-211 — rather than
    the broken FineGrainedLoss class, oa_loss.py:146-180)."""
    r = jnp.mean(region_embeds, axis=1)
    t = jnp.mean(tag_embeds, axis=1)
    return norm_softmax_loss(sim_matrix(t, r), temperature)
