"""oatx — TPU-native object-aware video-language pretraining framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of
FingerRec/OA-Transformer (CVPR'22 "Object-aware Video-language Pre-training for
Retrieval"): divided space-time ViT video tower + DistilBERT text tower trained with a
symmetric InfoNCE loss over an all-gathered cross-replica similarity matrix, plus
object-aware region/tag/grounding losses, retrieval evaluation, checkpoint import, and
visualization.

Package layout:
  oatx.config   — JSON config schema (reference-compatible), typed configs, registry
  oatx.core     — functional module utilities (param pytrees, init, precision policy)
  oatx.ops      — layer ops (XLA reference impls) + Pallas TPU kernels under ops.pallas
  oatx.models   — towers: SpaceTimeTransformer (ViT), DistilBERT, dual-tower wrappers
  oatx.losses   — contrastive losses (NormSoftmax + global-negative all-gather, etc.)
  oatx.metrics  — retrieval metrics (t2v/v2t R@K, MedR, ...)
  oatx.data     — host-side data plane: video decode, datasets, transforms, loaders
  oatx.parallel — mesh construction, shardings, collectives
  oatx.train    — optimizers/schedules, epoch engine, checkpointing
  oatx.eval     — retrieval eval (sliding-window ensembling, multi-stream sims)
  oatx.serve    — batched embedding service
  oatx.utils    — logging, profiler, timers, HTML viz
  oatx.visualization — attention heatmaps + region binary maps
  oatx.native   — first-party C++ (FFmpeg video decode), ctypes bindings
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("OATX_PLATFORM"):
    # Explicit platform pin (e.g. OATX_PLATFORM=cpu for hermetic subprocesses).
    # Needed because JAX_PLATFORMS alone cannot force CPU in this environment:
    # the axon sitecustomize's register() overrides the platform selection via
    # jax.config at import time (observed as "CPU" test subprocesses silently
    # running on the relay TPU, and hanging when the relay is down). An env
    # var honored in-code is the only override that survives that.
    import jax as _jax

    try:  # private probe — skip the staleness check if it moves
        from jax._src import xla_bridge as _xb

        if (_xb.backends_are_initialized()
                and _jax.default_backend() != _os.environ["OATX_PLATFORM"]):
            # config.update after backend init is a silent no-op — the exact
            # silent-TPU-grab bug this pin exists to prevent. Fail loudly
            # (harmless when the live backend already matches the pin).
            raise RuntimeError(
                f"OATX_PLATFORM={_os.environ['OATX_PLATFORM']} is set but JAX "
                f"already initialized backend "
                f"{_jax.default_backend()!r} before `import oatx` — the pin "
                "cannot take effect. Import oatx (or set jax_platforms) "
                "before any jax.devices()/dispatch call.")
    except ImportError:
        pass

    _jax.config.update("jax_platforms", _os.environ["OATX_PLATFORM"])
