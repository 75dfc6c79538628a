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

from .config import DataConfig, ExperimentConfig, ModelConfig
