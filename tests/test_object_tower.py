"""Object-feature stream (reference arch.stream == 3): a WORKING equivalent of
the bit-rotten upstream branch (oa_model.py:125-127 compute_object — its
object_model is never assigned; SpaceTimeObjectTransformer is an undefined
symbol). Covers: the object tower forward, padding-mask invariance, the
o2v/o2t eval streams (test.py:287-291), and config wiring from a reference-
style JSON (stream: 3 / object_params.input_objects)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oatx.models import object_tower as objt
from oatx.models import towers
from oatx.models import distilbert as dbert
from oatx.models import vit_spacetime as vst


@pytest.fixture(scope="module")
def obj_cfg():
    return objt.ObjectTowerConfig(feature_dim=70, dim=32, n_layers=2,
                                  n_heads=4, hidden_dim=64, top_k=6)


def _tower_cfg(obj_cfg):
    return towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(img_size=32, patch_size=16, embed_dim=32,
                                     depth=1, num_heads=2, num_frames=2),
        text=dbert.DistilBertConfig(vocab_size=64, dim=32, hidden_dim=64,
                                    n_layers=1, n_heads=2,
                                    max_position_embeddings=16),
        projection_dim=8,
        object_tower=obj_cfg,
    )


def test_object_tower_forward_and_padding_invariance(obj_cfg, rng):
    params = objt.init(jax.random.PRNGKey(0), obj_cfg)
    feats = rng.standard_normal((3, 6, 70)).astype(np.float32)
    feats[0, 3:] = 0.0  # sample 0: only 3 detections (rest zero-padded)
    out = jax.jit(lambda p, x: objt.apply(p, obj_cfg, x))(params, jnp.asarray(feats))
    assert out.shape == (3, 32)
    assert np.all(np.isfinite(np.asarray(out)))

    # padding invariance: nonzero rows count as real objects by design, so
    # the assertable invariance is that EXTRA ZERO rows change nothing:
    wider = np.zeros((3, 9, 70), np.float32)
    wider[:, :6] = feats
    out_w = jax.jit(lambda p, x: objt.apply(p, obj_cfg, x))(params, jnp.asarray(wider))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_w),
                               rtol=1e-4, atol=1e-5)


def test_object_tower_all_empty_sample_is_finite(obj_cfg):
    params = objt.init(jax.random.PRNGKey(0), obj_cfg)
    feats = jnp.zeros((2, 6, 70))
    out = objt.apply(params, obj_cfg, feats)
    assert np.all(np.isfinite(np.asarray(out)))


def test_compute_object_in_shared_space(obj_cfg, rng):
    cfg = _tower_cfg(obj_cfg)
    params = towers.init(jax.random.PRNGKey(1), cfg)
    assert "object_tower" in params and "obj_proj" in params
    feats = jnp.asarray(rng.standard_normal((4, 6, 70)), jnp.float32)
    emb = jax.jit(lambda p, o: towers.compute_object(p, cfg, o))(params, feats)
    assert emb.shape == (4, 8)  # projection_dim


def test_eval_reports_object_streams(obj_cfg, rng, tmp_path):
    """evaluate() adds o2v/o2t streams when batches carry 'object'."""
    from oatx.eval.retrieval_eval import evaluate
    from oatx.data.loader import Collator, ShardedLoader
    from oatx.data.tokenizer import WordPieceTokenizer

    cfg = _tower_cfg(obj_cfg)
    params = towers.init(jax.random.PRNGKey(1), cfg)
    tok = WordPieceTokenizer.build_from_corpus(
        [f"scene {i} dog" for i in range(16)], vocab_size=64)

    class ObjDataset:
        dataset_name = "SynthObj"

        def __len__(self):
            return 16

        def get_sample(self, i, r):
            g = np.random.default_rng(i)
            return {
                "video": (g.uniform(0, 255, (2, 32, 32, 3))).astype(np.uint8),
                "text": f"scene {i} dog",
                "object": g.standard_normal((6, 70)).astype(np.float32),
                "meta": {"index": i},
            }

    loader = ShardedLoader(ObjDataset(), batch_size=8, collate=Collator(tok, max_text_len=12),
                           shuffle=False, num_workers=1, seed=0)
    res = evaluate(params, cfg, loader, ["t2v_metrics"])
    assert set(res.object_streams) == {"o2v", "o2t"}
    assert res.object_embeds.shape == (16, 8)
    for stream in ("o2v", "o2t"):
        m = res.object_streams[stream]["t2v_metrics"]
        assert np.isfinite(m["R1"]) and np.isfinite(m["MedR"])


def test_stream3_config_enables_object_tower():
    from oatx.config.schema import ArchCfg, build_tower_config

    arch = ArchCfg.from_dict({
        "type": "FrozenInTime", "stream": 3,
        "args": {
            "video_params": {"model": "SpaceTimeTransformer", "num_frames": 4},
            "text_params": {"model": "distilbert-base-uncased"},
            "object_params": {"model": "ObjectTransformer", "input_objects": True,
                              "top_k": 8},
            "projection_dim": 256,
        }})
    cfg = build_tower_config(arch)
    assert cfg.object_tower is not None
    assert cfg.object_tower.top_k == 8
    assert cfg.object_tower.feature_dim == 2054


# ------------------------------------------------- review fixes (round 2)

def test_unused_object_tower_is_frozen_against_weight_decay():
    """A stream-3 object tower no loss consumes must be FROZEN: AdamW weight
    decay alone would otherwise erode the untrained params every step."""
    import jax
    import jax.numpy as jnp
    import optax

    from oatx.train import optim as optimlib

    params = {"object_tower": {"kernel": jnp.ones((4, 4))},
              "obj_proj": {"kernel": jnp.ones((4, 2))},
              "vid_proj": {"kernel": jnp.ones((4, 2))}}
    tf = optimlib.exclude_subtrees(None, ("object_tower", "obj_proj"))
    tx = optimlib.make_optimizer(lr=1e-2, weight_decay=0.1, trainable_filter=tf)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)  # no loss signal
    for _ in range(3):
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(np.asarray(params["object_tower"]["kernel"]), 1.0)
    np.testing.assert_array_equal(np.asarray(params["obj_proj"]["kernel"]), 1.0)
    # the consumed head DOES decay (sanity that the optimizer is live)
    assert np.all(np.asarray(params["vid_proj"]["kernel"]) < 1.0)


def test_object_nce_trains_the_object_tower():
    """loss.args.object_nce_weight > 0 adds o2v + t2o NCE terms on the baseline
    loss and produces real gradients for the object tower."""
    import jax
    import jax.numpy as jnp

    from oatx.models import distilbert as dbert, towers, vit_spacetime as vst
    from oatx.models.object_tower import ObjectTowerConfig
    from oatx.train import step as steplib

    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(img_size=32, patch_size=16, embed_dim=64,
                                     depth=1, num_heads=4, num_frames=2),
        text=dbert.DistilBertConfig(vocab_size=64, max_position_embeddings=16,
                                    dim=64, hidden_dim=128, n_layers=1, n_heads=4),
        projection_dim=16, variant="baseline",
        object_tower=ObjectTowerConfig(top_k=3))
    params = towers.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(rng.standard_normal((4, 2, 32, 32, 3)), jnp.float32),
        "input_ids": jnp.asarray(rng.integers(0, 64, (4, 8))),
        "attention_mask": jnp.ones((4, 8), jnp.int32),
        "object": jnp.asarray(rng.standard_normal((4, 3, 2054)), jnp.float32),
    }
    on = steplib.LossConfig(object_nce_weight=0.5)
    off = steplib.LossConfig()

    (loss_on, m_on), g_on = jax.value_and_grad(steplib.loss_fn, has_aux=True)(
        params, cfg, on, batch)
    (loss_off, m_off), g_off = jax.value_and_grad(steplib.loss_fn, has_aux=True)(
        params, cfg, off, batch)
    assert "loss_object" in m_on and "loss_object" not in m_off
    assert float(loss_on) != float(loss_off)
    gnorm_on = sum(float(jnp.abs(g).sum())
                   for g in jax.tree_util.tree_leaves(g_on["object_tower"]))
    gnorm_off = sum(float(jnp.abs(g).sum())
                    for g in jax.tree_util.tree_leaves(g_off["object_tower"]))
    assert gnorm_on > 0 and gnorm_off == 0


def test_pallas_space_optin_falls_back_for_cls_last():
    """set_use_pallas(True) with cls_position='last' must NOT reach the
    CLS-first kernel (it would silently mis-group tokens); the XLA path runs
    and matches the kernel-disabled result exactly."""
    import jax
    import jax.numpy as jnp

    from oatx.ops import attention as attn

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 9, 32)) * 0.1, jnp.float32)
    p = {"qkv": {"kernel": jnp.asarray(rng.standard_normal((32, 96)) * 0.05),
                 "bias": jnp.zeros((96,))},
         "proj": {"kernel": jnp.asarray(rng.standard_normal((32, 32)) * 0.05),
                  "bias": jnp.zeros((32,))}}
    try:
        attn.set_use_pallas(True)
        got = attn.divided_attention(p, x, 4, 2, mode="space", cls_pos="last")
    finally:
        attn.set_use_pallas(None)
    want = attn.divided_attention(p, x, 4, 2, mode="space", cls_pos="last")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_cpu_mesh_flags_raises_existing_count():
    import __graft_entry__ as g

    assert g._cpu_mesh_flags("", 8).endswith("device_count=8")
    kept = g._cpu_mesh_flags("--xla_force_host_platform_device_count=16", 8)
    assert "device_count=16" in kept
    raised = g._cpu_mesh_flags(
        "--foo --xla_force_host_platform_device_count=4 --bar", 8)
    assert "device_count=8" in raised and "--foo" in raised and "--bar" in raised
