"""simple_multimodal_tpu — a TPU-native multimodal emotion recognition framework.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of
nl1xx/simple-multimodal: three pretrained-architecture encoders (DeBERTa-v3,
Wav2Vec2, ViT+LSTM) projected into a shared fusion space, seven fusion
strategies, four training modes (standard, few-shot, distillation, robust),
an ablation runner, a full evaluator, a synthetic-data generator, and an
interactive demo — built on jit/pjit over a device mesh with Pallas kernels
on the hot attention paths.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Honor JAX_PLATFORMS even when a sitecustomize preloaded jax before
    # this process saw the env var (jax then ignores it): re-apply it via
    # the config as long as no backend has been instantiated yet. Without
    # this, `JAX_PLATFORMS=cpu <cli>` on a host with an unreachable TPU
    # plugin hangs in device discovery instead of running on CPU.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # backends already live: keep jax's own resolution
        pass

from .config import DataConfig, ExperimentConfig, ModelConfig
