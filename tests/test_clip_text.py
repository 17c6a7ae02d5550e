"""Golden tests: first-party CLIP text encoder + BPE tokenizer vs the
reference's vendored CLIP (Visualization/.../clip/{model,simple_tokenizer,clip}.py),
imported as a random-init torch oracle — reference code is never copied."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from oatx.data.clip_tokenizer import ClipTokenizer  # noqa: E402
from oatx.models import clip_text as ct  # noqa: E402
from oatx.models import convert  # noqa: E402

REF_CLIP_DIR = ("/root/reference/Visualization/"
                "Cross_Modality_Transformer_Visualization/model/vision_models/clip")
REF_BPE = os.path.join(REF_CLIP_DIR, "bpe_simple_vocab_16e6.txt.gz")


def _install_ftfy_stub():
    """The reference tokenizer imports ftfy just for fix_text; our test
    strings are well-formed so identity matches its behavior."""
    if "ftfy" in sys.modules:
        return
    m = types.ModuleType("ftfy")
    m.fix_text = lambda s: s
    sys.modules["ftfy"] = m


def _load_ref(fname, name):
    path = os.path.join(REF_CLIP_DIR, fname)
    if not os.path.exists(path):
        pytest.skip(f"reference CLIP not available: {path}")
    _install_ftfy_stub()
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ------------------------------------------------------------------ tokenizer

CASES = [
    "a photo of a dog",
    "traffic light",
    "He's running, isn't he?!",
    "Multiple   spaces\tand\nnewlines",
    "numbers 123 and 456789",
    "CAPS and MiXeD case",
    "café naïve résumé",  # accented latin
    "emoji \U0001F600 ok",
    "hyphen-ated under_scored",
    "a " * 90 + "long tail",  # > 77 tokens for truncate case
    "",
    "xqzjv wvvqx",  # unlikely merges → byte-level fallback
]


@pytest.fixture(scope="module")
def ref_tok():
    st = _load_ref("simple_tokenizer.py", "ref_simple_tokenizer")
    return st.SimpleTokenizer(bpe_path=REF_BPE)


@pytest.fixture(scope="module")
def oatx_tok():
    if not os.path.exists(REF_BPE):
        pytest.skip("BPE vocab unavailable")
    return ClipTokenizer(bpe_path=REF_BPE)


def test_tokenizer_vocab_matches(ref_tok, oatx_tok):
    assert oatx_tok.vocab_size == len(ref_tok.encoder) == 49408
    assert oatx_tok.sot_id == ref_tok.encoder["<|startoftext|>"]
    assert oatx_tok.eot_id == ref_tok.encoder["<|endoftext|>"]
    # full symbol table identical, not just size
    assert oatx_tok.encoder == ref_tok.encoder


@pytest.mark.parametrize("text", CASES, ids=range(len(CASES)))
def test_tokenizer_encode_matches(ref_tok, oatx_tok, text):
    assert oatx_tok.encode(text) == ref_tok.encode(text)


def test_tokenizer_object_vocab_matches(ref_tok, oatx_tok):
    vocab_path = "/root/reference/OATrans/utils/objects_vocab.txt"
    if not os.path.exists(vocab_path):
        pytest.skip("objects_vocab.txt unavailable")
    with open(vocab_path) as f:
        names = [l.strip() for l in f if l.strip()]
    for name in names[::37]:  # every 37th of 1599 classes
        assert oatx_tok.encode(name) == ref_tok.encode(name), name


def test_tokenize_padding_and_truncate(ref_tok, oatx_tok):
    # reference clip.py:211-228 semantics re-derived on the oracle tokenizer
    for text in CASES:
        ids = [ref_tok.encoder["<|startoftext|>"]] + ref_tok.encode(text) + [
            ref_tok.encoder["<|endoftext|>"]]
        ours = oatx_tok.tokenize([text], truncate=True)[0]
        if len(ids) > 77:
            ids = ids[:77]
            ids[-1] = ref_tok.encoder["<|endoftext|>"]
        expect = np.zeros(77, np.int64)
        expect[: len(ids)] = ids
        np.testing.assert_array_equal(ours, expect)
    with pytest.raises(ValueError):
        oatx_tok.tokenize([CASES[9]], truncate=False)


def test_tokenizer_decode_roundtrip(oatx_tok):
    for text in ["a photo of a dog", "traffic light ahead"]:
        assert oatx_tok.decode(oatx_tok.encode(text)) == text
    # digit runs split per-digit by the CLIP word pattern ([\p{N}]), so the
    # roundtrip re-spaces them — upstream-faithful behavior
    assert oatx_tok.decode(oatx_tok.encode("numbers 123")) == "numbers 1 2 3"


def test_for_tests_tokenizer_is_hermetic():
    tok = ClipTokenizer.for_tests(["a dog runs", "a cat sits", "dogs and cats"])
    ids = tok.tokenize(["a dog runs fast"], context_length=32)
    assert ids.shape == (1, 32)
    assert ids[0, 0] == tok.sot_id and tok.eot_id in ids[0]
    # deterministic across builds
    tok2 = ClipTokenizer.for_tests(["a dog runs", "a cat sits", "dogs and cats"])
    np.testing.assert_array_equal(
        ids, tok2.tokenize(["a dog runs fast"], context_length=32))


# ------------------------------------------------------------------ model

TINY = dict(embed_dim=48, image_resolution=32, vision_layers=1, vision_width=64,
            vision_patch_size=16, context_length=24, vocab_size=96,
            transformer_width=128, transformer_heads=2, transformer_layers=3)


@pytest.fixture(scope="module")
def torch_clip():
    torch = pytest.importorskip("torch")
    mod = _load_ref("model.py", "ref_clip_model")
    torch.manual_seed(0)
    model = mod.CLIP(**TINY).float().eval()
    return torch, model


def _rand_ids(rng, n, t, vocab, eot):
    """ids with sot=vocab-2 … eot=vocab-1 at a random position, zero-padded —
    eot is the max id so argmax pooling finds it (OpenAI semantics)."""
    ids = np.zeros((n, t), np.int64)
    for i in range(n):
        ln = rng.integers(3, t - 1)
        ids[i, 0] = vocab - 2
        ids[i, 1: ln] = rng.integers(1, vocab - 2, ln - 1)
        ids[i, ln] = vocab - 1
    return ids


def test_encode_text_tokens_golden(torch_clip):
    """Our per-token variant vs the vendored encode_text (model.py:345-363:
    ALL tokens projected, L2-normalized)."""
    torch, model = torch_clip
    params, cfg = convert.clip_text_from_torch(
        {k: v.numpy() for k, v in model.state_dict().items()})
    assert cfg.width == 128 and cfg.layers == 3 and cfg.heads == 2
    rng = np.random.default_rng(0)
    ids = _rand_ids(rng, 4, TINY["context_length"], TINY["vocab_size"], None)
    with torch.no_grad():
        ref = model.encode_text(torch.from_numpy(ids)).numpy()
    ours = np.asarray(ct.encode_text_tokens(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_encode_text_eot_pooled_golden(torch_clip):
    """Standard CLIP pooling vs the oracle composed exactly as the reference
    TextEncoder does (OATrans/model/prompt_learner.py:18-29)."""
    torch, model = torch_clip
    params, cfg = convert.clip_text_from_torch(
        {k: v.numpy() for k, v in model.state_dict().items()})
    rng = np.random.default_rng(1)
    ids = _rand_ids(rng, 5, TINY["context_length"], TINY["vocab_size"], None)
    tt = torch.from_numpy(ids)
    with torch.no_grad():
        x = model.token_embedding(tt)
        x = x + model.positional_embedding
        x = x.permute(1, 0, 2)
        x = model.transformer(x)
        x = x.permute(1, 0, 2)
        x = model.ln_final(x)
        ref = (x[torch.arange(x.shape[0]), tt.argmax(dim=-1)]
               @ model.text_projection).numpy()
    ours = np.asarray(ct.encode_text(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)
    cos = np.sum(ours * ref, -1) / (
        np.linalg.norm(ours, axis=-1) * np.linalg.norm(ref, axis=-1))
    assert np.all(cos > 0.9999)


def test_causal_mask_padding_invariance():
    """Trailing padding must not change the EOT-pooled embedding (causal
    attention sees only positions <= eot)."""
    cfg = ct.ClipTextConfig(vocab_size=64, context_length=20, width=64,
                            heads=2, layers=2, embed_dim=32)
    params = ct.init(jax.random.PRNGKey(0), cfg)
    ids = np.zeros((1, 20), np.int32)
    ids[0, :4] = [62, 5, 9, 63]  # sot, 2 tokens, eot
    a = ct.encode_text(params, cfg, jnp.asarray(ids))
    ids2 = ids.copy()
    ids2[0, 10] = 7  # junk in the padding region, AFTER eot
    b = ct.encode_text(params, cfg, jnp.asarray(ids2))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_scan_matches_unrolled():
    cfg = ct.ClipTextConfig(vocab_size=64, context_length=16, width=64,
                            heads=2, layers=3, embed_dim=32)
    params = ct.init(jax.random.PRNGKey(1), cfg)
    ids = np.zeros((2, 16), np.int32)
    ids[:, :3] = [[62, 5, 63], [62, 9, 63]]
    a = ct.encode_text(params, cfg, jnp.asarray(ids))
    cfg_s = ct.ClipTextConfig(**{**cfg.__dict__, "scan_layers": True})
    b = ct.encode_text(params, cfg_s, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_coop_clip_prompting(torch_clip):
    """clip_class_embeddings splices ctx over the X placeholders: with ctx set
    EQUAL to the X-token embeddings it must reproduce the plain encode."""
    torch, model = torch_clip
    params, cfg = convert.clip_text_from_torch(
        {k: v.numpy() for k, v in model.state_dict().items()})
    from oatx.models import prompt_learner as pl

    n_ctx, x_id = 4, 7
    ids = np.zeros((3, cfg.context_length), np.int32)
    for i in range(3):
        ids[i, 0] = cfg.vocab_size - 2
        ids[i, 1: 1 + n_ctx] = x_id
        ids[i, 1 + n_ctx] = 10 + i
        ids[i, 2 + n_ctx] = cfg.vocab_size - 1
    tok_prompts = jnp.asarray(ids)
    ctx_equal = jnp.broadcast_to(params["token_embedding"][x_id][None],
                                 (n_ctx, cfg.width))
    out = pl.clip_class_embeddings({"ctx": ctx_equal}, params, cfg,
                                   tok_prompts, n_ctx)
    plain = ct.encode_text(params, cfg, tok_prompts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(plain), atol=1e-5)
    # and with a different ctx the embeddings must move (non-uniform
    # perturbation — a uniform shift would be erased by the pre-LN LayerNorm)
    noise = jax.random.normal(jax.random.PRNGKey(3), ctx_equal.shape)
    out2 = pl.clip_class_embeddings(
        {"ctx": ctx_equal + noise}, params, cfg, tok_prompts, n_ctx)
    assert float(jnp.abs(out2 - out).max()) > 1e-3


# ------------------------------------------------------- region-memory bank

def test_build_region_memory_clip_backend(tmp_path):
    """Hermetic bank build through the first-party CLIP path (synthetic BPE,
    random init — the labeled smoke mode); shape/determinism invariants."""
    sys.path.insert(0, "/root/repo/tools")
    try:
        import build_region_memory as brm
    finally:
        sys.path.pop(0)
    vocab = tmp_path / "objects_vocab.txt"
    # file format matches the reference objects_vocab.txt: one class per line,
    # NO __background__ row (load_object_vocab prepends it)
    names = [f"thing{i}" for i in range(17)]
    vocab.write_text("\n".join(names) + "\n")
    out = tmp_path / "bank.npy"
    env_bpe = os.environ.pop("OATX_CLIP_BPE", None)
    try:
        rc = brm.main(["--vocab", str(vocab), "--out", str(out), "--dim", "64"])
    finally:
        if env_bpe is not None:
            os.environ["OATX_CLIP_BPE"] = env_bpe
    assert rc == 0
    bank = np.load(out)
    assert bank.shape == (17, 64) and bank.dtype == np.float32
    assert np.all(np.isfinite(bank))
    # distinct classes get distinct rows
    assert np.unique(bank.round(4), axis=0).shape[0] == 17


# ------------------------------------------------- text_family='clip' tower

def test_clip_text_family_tower_and_config():
    """Config → TowerConfig with text_params.model='clip', full dual-tower
    forward + one train step over the clip text tower."""
    from oatx.config.schema import ArchCfg
    from oatx.config import schema as schemalib
    from oatx.models import towers
    from oatx.train import step as steplib
    import optax

    arch = ArchCfg.from_dict({
        "type": "FrozenInTime", "variant": "baseline", "args": {
            "video_params": {"model": "SpaceTimeTransformer", "num_frames": 2,
                             "input_res": 32, "embed_dim": 64, "depth": 1,
                             "num_heads": 4, "time_init": "zeros",
                             "pretrained": False},
            "text_params": {"model": "clip", "pretrained": False,
                            "vocab_size": 600, "dim": 64, "n_layers": 2,
                            "n_heads": 2},
            "projection": "minimal", "projection_dim": 32,
            "load_checkpoint": ""}})
    assert arch.text_params.family == "clip"
    cfg = schemalib.build_tower_config(arch)
    assert cfg.text_family == "clip" and cfg.text.width == 64
    assert cfg.text.embed_dim == 64 and cfg.text.layers == 2

    params = towers.init(jax.random.PRNGKey(0), cfg)
    assert params["txt_proj"]["kernel"].shape == (64, 32)
    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(rng.standard_normal((4, 2, 32, 32, 3)), jnp.float32),
        "input_ids": jnp.asarray(rng.integers(1, 600, (4, 12)).astype(np.int32)),
        "attention_mask": jnp.ones((4, 12), jnp.int32),
    }
    te, ve = towers.forward_baseline(params, cfg, batch)
    assert te.shape == (4, 32) and ve.shape == (4, 32)

    opt = optax.adamw(1e-3)
    state = steplib.init_state(jax.random.PRNGKey(1), cfg, opt, params=params)
    step = steplib.make_train_step(cfg, steplib.LossConfig(), opt, donate=False)
    state2, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    # clip text params actually received gradients
    a = params["text"]["token_embedding"]
    b = state2.params["text"]["token_embedding"]
    assert float(jnp.abs(a - b).max()) > 0


def test_clip_batch_tokenizer_collator_roundtrip(tmp_path):
    from oatx.data.clip_tokenizer import (ClipBatchTokenizer, ClipTokenizer,
                                          load_clip_batch_tokenizer)

    corpus = ["a dog runs", "a cat sits in scene"]
    tok = ClipBatchTokenizer(ClipTokenizer.for_tests(corpus, extra_merges=64))
    out = tok(corpus, max_length=16)
    assert out["input_ids"].shape == (2, 16)
    assert out["attention_mask"].shape == (2, 16)
    assert out["input_ids"][0, 0] == tok.tok.sot_id
    # mask covers exactly the non-pad ids
    np.testing.assert_array_equal(out["attention_mask"],
                                  (out["input_ids"] != 0).astype(np.int32))
    # save_vocab persists the merges; reload resolves from the checkpoint dir
    tok.save_vocab(str(tmp_path / "vocab.txt"))
    assert (tmp_path / "clip_bpe.txt.gz").exists()
    tok2 = load_clip_batch_tokenizer(search_dirs=[str(tmp_path)])
    np.testing.assert_array_equal(tok2(corpus, max_length=16)["input_ids"],
                                  out["input_ids"])


def test_clip_family_global_local_rejected():
    from oatx.models import clip_text as ct
    from oatx.models import towers
    from oatx.models import vit_spacetime as vst

    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(img_size=32, patch_size=16, embed_dim=64,
                                     depth=1, num_heads=4, num_frames=2),
        text=ct.ClipTextConfig(vocab_size=64, context_length=16, width=64,
                               heads=2, layers=1, embed_dim=64),
        text_family="clip", variant="global_local", projection_dim=16)
    with pytest.raises(NotImplementedError):
        towers.init(jax.random.PRNGKey(0), cfg)


def test_clip_text_export_roundtrip_and_oracle_load(torch_clip):
    """oatx→torch export of the CLIP text tower (VERDICT r3 item 6): bare keys
    load into the vendored reference CLIP with zero text-side missing keys, and
    the re-imported tree reproduces encode_text exactly."""
    torch, model = torch_clip
    params, cfg = convert.clip_text_from_torch(
        {k: v.numpy() for k, v in model.state_dict().items()})

    sd = convert.clip_text_to_torch(params)
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False)
    assert unexpected == []
    # every missing key must belong to the visual/logit half, not the text side
    text_side = ("token_embedding", "positional_embedding", "transformer.",
                 "ln_final", "text_projection")
    assert [k for k in missing if k.startswith(text_side)] == []

    back, cfg2 = convert.clip_text_from_torch(sd)
    assert cfg2 == cfg
    rng = np.random.default_rng(7)
    ids = _rand_ids(rng, 4, TINY["context_length"], TINY["vocab_size"], None)
    a = np.asarray(ct.encode_text(params, cfg, jnp.asarray(ids)))
    b = np.asarray(ct.encode_text(back, cfg2, jnp.asarray(ids)))
    np.testing.assert_array_equal(a, b)

    # and the 'text_model.'-prefixed FrozenInTime-style export round-trips too
    prefixed = {}
    convert._export_clip_text(prefixed, params, prefix="text_model.")
    back2, _ = convert.clip_text_from_torch(prefixed)
    c = np.asarray(ct.encode_text(back2, cfg, jnp.asarray(ids)))
    np.testing.assert_array_equal(a, c)
