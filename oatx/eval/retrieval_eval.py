"""Retrieval evaluation (reference test.py:57-419 equivalent).

Embeds the whole eval split with the jitted eval step, optionally
temporal-ensembles sliding-window video embeddings (mean per video, first
caption embedding per video — test.py:182-279), computes the similarity matrix
and the configured retrieval metrics, and returns everything for reporting /
visualization.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from oatx.config.registry import METRICS
from oatx.config.schema import ExperimentCfg
from oatx.data.loader import ShardedLoader, device_prefetch, padded_batches
from oatx.losses import contrastive as C
from oatx.train import step as steplib


@dataclasses.dataclass
class EvalResult:
    text_embeds: np.ndarray
    video_embeds: np.ndarray
    sims: np.ndarray
    metrics: Dict[str, Dict[str, float]]
    meta: List[Dict[str, Any]]
    # stream-3 object-embedding streams (reference test.py:287-291 sims_o2v /
    # sims_o2t) — populated when the model has an object tower and the loader
    # emits batch['object']: {'o2v': {metric: {...}}, 'o2t': ...}
    object_streams: Dict[str, Dict[str, Dict[str, float]]] = dataclasses.field(
        default_factory=dict)
    object_embeds: Optional[np.ndarray] = None


def ensemble_windows(
    text_embeds: np.ndarray, video_embeds: np.ndarray, groups: np.ndarray
):
    """Mean video embeddings over each window group; keep the first text
    embedding per group (reference test.py:243-266)."""
    uniq = []
    seen = {}
    for g in groups:
        if g not in seen:
            seen[g] = len(uniq)
            uniq.append(g)
    t_out = np.zeros((len(uniq), text_embeds.shape[1]), text_embeds.dtype)
    v_out = np.zeros((len(uniq), video_embeds.shape[1]), video_embeds.dtype)
    counts = np.zeros(len(uniq))
    first = np.full(len(uniq), -1, np.int64)
    for i, g in enumerate(groups):
        j = seen[g]
        v_out[j] += video_embeds[i]
        counts[j] += 1
        if first[j] < 0:
            first[j] = i
    v_out /= counts[:, None]
    t_out = text_embeds[first]
    return t_out, v_out


def evaluate(
    params,
    tower_cfg,
    loader: ShardedLoader,
    metric_names: List[str] = ("t2v_metrics", "v2t_metrics"),
    mesh=None,
    query_masks: Optional[np.ndarray] = None,
    chunk: Optional[int] = 8,
) -> EvalResult:
    import jax

    # chunk: single-chip eval scans bs-`chunk` sub-batches inside one jit —
    # large eval batches otherwise hit XLA's big-batch layout transposes
    # (193.7 clips/s at bs=64 vs 320 chunked; PERF.md round 3). Under a mesh
    # the batch dim is sharded over data; chunking would re-split that dim, so
    # the scan is disabled there (per-chip shards stay small anyway). Batches
    # arrive padded to exactly loader.batch_size, so indivisible sizes just
    # disable the scan rather than erroring.
    if chunk is not None:
        divisible = loader.batch_size <= chunk or loader.batch_size % chunk == 0
        if mesh is not None or not divisible:
            chunk = None
    eval_step = steplib.make_eval_step(tower_cfg, chunk=chunk)
    obj_fn = None
    if getattr(tower_cfg, "object_tower", None) is not None:
        from oatx.models import towers

        obj_fn = jax.jit(lambda p, o: towers.compute_object(p, tower_cfg, o))
    multiple = loader.batch_size
    if mesh is not None:
        from oatx.parallel.mesh import batch_shards

        multiple = max(multiple, batch_shards(mesh))
    texts, vids, objs, metas = [], [], [], []
    for batch, n_valid in device_prefetch(
            padded_batches(iter(loader), multiple), mesh):
        meta = batch.pop("meta", [])
        obj_feats = batch.pop("object", None)
        out = eval_step(params, batch)
        texts.append(np.asarray(out["text_embeds"])[:n_valid])
        vids.append(np.asarray(out["video_embeds"])[:n_valid])
        if obj_fn is not None and obj_feats is not None:
            objs.append(np.asarray(obj_fn(params, obj_feats))[:n_valid])
        metas.extend(meta[:n_valid])
    text_e = np.concatenate(texts)
    vid_e = np.concatenate(vids)
    obj_e = np.concatenate(objs) if objs else None

    if metas and "window_group" in metas[0]:
        groups = np.asarray([m["window_group"] for m in metas])
        if obj_e is not None:
            _, obj_e = ensemble_windows(text_e, obj_e, groups)
        text_e, vid_e = ensemble_windows(text_e, vid_e, groups)

    if metas and "caption_group" in metas[0]:
        # full-cut protocol: all caption rows vs one video embed per group,
        # query masks for padded caption slots (reference metric.py query_masks)
        groups = np.asarray([m["caption_group"] for m in metas])
        first = np.unique(groups, return_index=True)[1]
        vid_e = vid_e[np.sort(first)]
        if query_masks is None:
            query_masks = np.asarray([m.get("caption_valid", 1) for m in metas])

    sims = np.asarray(C.sim_matrix(jnp.array(text_e), jnp.array(vid_e)))
    results: Dict[str, Dict[str, float]] = {}
    from oatx.metrics.retrieval import REQUIRES_QUERY_MASKS

    for name in metric_names:
        fn = METRICS.get(name)
        if query_masks is not None:
            results[name] = fn(sims, query_masks)
        elif name in REQUIRES_QUERY_MASKS:
            import logging

            logging.getLogger("oatx.eval").warning(
                "metric %s needs query_masks (label matrix) — skipped", name)
        else:
            results[name] = fn(sims)

    # stream-3 object streams: o2v = object↔video, o2t = text↔object
    # (reference test.py:287-291; the caption_group full-cut protocol collapses
    # videos per group, so object streams are reported on the per-row embeds)
    object_streams: Dict[str, Dict[str, Dict[str, float]]] = {}
    if obj_e is not None and obj_e.shape[0] == vid_e.shape[0]:
        for stream, (a, b) in {
            "o2v": (obj_e, vid_e),
            "o2t": (text_e, obj_e),
        }.items():
            s = np.asarray(C.sim_matrix(jnp.array(a), jnp.array(b)))
            object_streams[stream] = {
                name: METRICS.get(name)(s) for name in metric_names
                if name not in REQUIRES_QUERY_MASKS}
    return EvalResult(text_e, vid_e, sims, results, metas,
                      object_streams=object_streams, object_embeds=obj_e)


def evaluate_multiple_choice(
    params,
    tower_cfg,
    loader: ShardedLoader,
    tokenizer,
    max_text_len: int = 30,
    mesh=None,
) -> Dict[str, float]:
    """Multiple-choice eval (LSMDC_choice): each sample carries candidate
    captions in meta['choices'] with meta['answer']; score each candidate
    against the clip embedding, accuracy = argmax hits."""
    import jax

    from oatx.models import towers
    from oatx.train.step import make_augmenter

    aug = make_augmenter(train=False, tower_cfg=tower_cfg)
    vid_fn = jax.jit(lambda p, v: towers.compute_video(p, tower_cfg, v)["cls"])
    txt_fn = jax.jit(lambda p, i, m: towers.compute_text(p, tower_cfg, i, m))
    correct = total = 0
    for batch in loader:
        meta = batch.pop("meta", [])
        fb = aug(jax.random.PRNGKey(0), {"video": jnp.asarray(batch["video"])})
        v_emb = np.asarray(vid_fn(params, fb["video"]))
        for i, m in enumerate(meta):
            choices = m.get("choices")
            if not choices:
                continue
            tok = tokenizer(list(choices), max_length=max_text_len)
            t_emb = np.asarray(txt_fn(params, jnp.asarray(tok["input_ids"]),
                                      jnp.asarray(tok["attention_mask"])))
            sims = np.asarray(C.sim_matrix(jnp.asarray(t_emb), jnp.asarray(v_emb[i: i + 1])))
            pred = int(np.argmax(sims[:, 0]))
            correct += int(pred == int(m.get("answer", 0)))
            total += 1
    return {"accuracy": 100.0 * correct / max(total, 1), "n": total}


def evaluate_streams(
    params,
    tower_cfg,
    loader: ShardedLoader,
    metric_names: List[str] = ("t2v_metrics",),
    mesh=None,
) -> Dict[str, Dict[str, Dict[str, float]]]:
    """Multi-stream retrieval eval for the global-local variant (reference
    test.py's st2sv/lt2sv/lt2lv/o2v stream sims, test.py:280-374):

      st2sv — short (caption) text ↔ video clip
      lt2sv — long (caption+tags) text ↔ video clip
      st2ov — short text ↔ object-frame image
      lt2ov — long text ↔ object-frame image

    Returns {stream: {metric: {...}}}."""
    import jax

    from oatx.models import towers
    from oatx.train.step import make_augmenter

    aug = make_augmenter(train=False, tower_cfg=tower_cfg)
    from oatx.train.step import scan_chunked

    def _fwd(p, b):
        body = lambda mb: towers.forward_global_local(p, tower_cfg, mb)
        bs = jax.tree_util.tree_leaves(b)[0].shape[0]
        if mesh is None and bs % 8 == 0:
            # single-chip: scan bs-8 sub-batches (large-batch layout fix,
            # PERF.md round 3); under a mesh the data axis already splits bs
            return scan_chunked(body, 8)(b)
        return body(b)

    fwd = jax.jit(_fwd)
    acc: Dict[str, List[np.ndarray]] = {k: [] for k in (
        "text_embeds", "pad_text_embeds", "video_embeds", "object_img_embeds")}
    multiple = loader.batch_size
    if mesh is not None:
        from oatx.parallel.mesh import batch_shards

        multiple = max(multiple, batch_shards(mesh))
    for batch, n_valid in device_prefetch(padded_batches(iter(loader), multiple), mesh):
        batch.pop("meta", None)
        out = fwd(params, aug(jax.random.PRNGKey(0), batch))
        for k in acc:
            acc[k].append(np.asarray(out[k])[:n_valid])
    embeds = {k: np.concatenate(v) for k, v in acc.items()}

    streams = {
        "st2sv": (embeds["text_embeds"], embeds["video_embeds"]),
        "lt2sv": (embeds["pad_text_embeds"], embeds["video_embeds"]),
        "st2ov": (embeds["text_embeds"], embeds["object_img_embeds"]),
        "lt2ov": (embeds["pad_text_embeds"], embeds["object_img_embeds"]),
    }
    from oatx.metrics.retrieval import REQUIRES_QUERY_MASKS

    results: Dict[str, Dict[str, Dict[str, float]]] = {}
    for stream, (a, b) in streams.items():
        sims = np.asarray(C.sim_matrix(jnp.array(a), jnp.array(b)))
        results[stream] = {name: METRICS.get(name)(sims) for name in metric_names
                           if name not in REQUIRES_QUERY_MASKS}
    return results


def export_region_maps(
    params,
    tower_cfg,
    loader: ShardedLoader,
    out_dir: str,
    limit: int = 16,
) -> List[str]:
    """Region-grounding binary-map export (reference test_region_mem.py:128-170):
    per sample, [object frame | GT top-object patch mask | predicted sigmoid
    region similarity] concatenated as one PNG."""
    import os

    import jax

    from oatx.models import towers
    from oatx.visualization.binary_map import save_binary_map

    os.makedirs(out_dir, exist_ok=True)
    fwd = jax.jit(lambda p, b: towers.forward_region_mem(p, tower_cfg, b))
    from oatx.train.step import make_augmenter

    aug = make_augmenter(train=False, tower_cfg=tower_cfg)
    paths: List[str] = []
    for batch in loader:
        meta = batch.pop("meta", [])
        raw_object_frames = batch.get("object_frame")
        fb = aug(jax.random.PRNGKey(0), {k: jnp.asarray(v) for k, v in batch.items()})
        out = fwd(params, fb)
        sims = jax.nn.sigmoid(out["region_sim_logits"])
        for i in range(sims.shape[0]):
            if len(paths) >= limit:
                return paths
            frame = np.asarray(raw_object_frames[i, 0])
            gt = np.asarray(batch["patch_masks"][i][0])
            pred = np.asarray(sims[i][0])
            label = meta[i]["raw_captions"][:40] if i < len(meta) else ""
            paths.append(save_binary_map(
                os.path.join(out_dir, f"{len(paths)}_predict.png"),
                frame, gt, pred, label=label))
    return paths
