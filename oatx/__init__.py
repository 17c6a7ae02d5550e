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

    _jax.config.update("jax_platforms", _os.environ["OATX_PLATFORM"])
