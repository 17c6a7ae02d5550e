"""Helpers to build torch golden-oracle models for parity tests.

The reference SpaceTimeTransformer (at /root/reference, read-only) imports timm,
which is not installed; we stub the three symbols it uses so the *reference code
itself* (never copied into this repo) can serve as the numerical oracle.
"""

import importlib.util
import os
import sys
import types

REFERENCE_VIDEO_TRANSFORMER = "/root/reference/OATrans/model/video_transformer.py"


def _install_timm_stub():
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as nn

    layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            mask = torch.rand(x.shape[0], *([1] * (x.ndim - 1)), device=x.device) < keep
            return x / keep * mask

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    models.layers = layers
    timm.models = models
    # transformers probes importlib.util.find_spec('timm'); give the stubs specs
    from importlib.machinery import ModuleSpec

    for name, mod in (("timm", timm), ("timm.models", models),
                      ("timm.models.layers", layers)):
        mod.__spec__ = ModuleSpec(name, loader=None)
        sys.modules[name] = mod


def load_reference_video_transformer():
    """Import the reference video_transformer module (oracle), or None if absent."""
    if not os.path.exists(REFERENCE_VIDEO_TRANSFORMER):
        return None
    _install_timm_stub()
    spec = importlib.util.spec_from_file_location(
        "ref_video_transformer", REFERENCE_VIDEO_TRANSFORMER
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


REFERENCE_OA_REGION = "/root/reference/OATrans/model/oa_video_transformer_region.py"
REFERENCE_OA_GLOBAL_LOCAL = (
    "/root/reference/OATrans/model/oa_video_transformer_global_local.py")


def load_reference_module(path, name):
    """Import an arbitrary reference model file as an oracle (timm stubbed)."""
    if not os.path.exists(path):
        return None
    _install_timm_stub()
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
