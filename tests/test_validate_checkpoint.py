"""tools/validate_checkpoint.py e2e: a random reference-schema .pth must
import with cosine ≈ 1.0 on every stream (the real-weights runbook's
one-command check, docs/real_weights.md)."""

import json
import os
import subprocess
import sys

import pytest

torch = pytest.importorskip("torch")


def test_validate_checkpoint_tool(tmp_path):
    from torch_oracles import load_reference_video_transformer

    mod = load_reference_video_transformer()
    if mod is None:
        pytest.skip("reference repo not available")
    from transformers import DistilBertConfig, DistilBertModel

    torch.manual_seed(3)
    video_model = mod.SpaceTimeTransformer(
        img_size=112, embed_dim=128, depth=2, num_heads=4, num_frames=2,
        time_init="random", attention_style="frozen-in-time")
    with torch.no_grad():
        video_model.temporal_embed.normal_(0, 0.02)
    text_model = DistilBertModel(DistilBertConfig(n_layers=2))
    txt_proj = torch.nn.Sequential(torch.nn.ReLU(), torch.nn.Linear(768, 32))
    vid_proj = torch.nn.Sequential(torch.nn.Linear(128, 32))
    sd = {}
    for prefix, m in (("video_model.", video_model), ("text_model.", text_model),
                      ("txt_proj.", txt_proj), ("vid_proj.", vid_proj)):
        for k, v in m.state_dict().items():
            sd[prefix + k] = v
    pth = tmp_path / "random_ref.pth"
    torch.save({"state_dict": sd}, str(pth))

    out_json = tmp_path / "manifest.json"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["OATX_PLATFORM"] = "cpu"  # in-code pin; JAX_PLATFORMS alone is overridden by the axon sitecustomize
    out = subprocess.run(
        [sys.executable, "tools/validate_checkpoint.py", "--ckpt", str(pth),
         "--num-frames", "2", "--img-size", "112", "--embed-dim", "128",
         "--depth", "2", "--num-heads", "4", "--projection-dim", "32",
         "--json", str(out_json)],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=1800)
    assert out.returncode == 0, out.stdout[-1500:] + out.stderr[-1500:]
    manifest = json.loads(out_json.read_text())
    assert manifest["ok"] is True
    for k, v in manifest.items():
        if k.endswith("_cosine"):
            assert v >= 0.999, (k, v)
    assert manifest["missing_keys"] == 0
