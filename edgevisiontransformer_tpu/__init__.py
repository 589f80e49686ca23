"""edgevisiontransformer_tpu — TPU-native Vision Transformer framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
xudoong/EdgeVisionTransformer (reference at /root/reference): ViT/DeiT,
T2T-ViT and Swin model families, on-TPU benchmarking + per-op profiling,
fp16/bf16/int8 quantization, attention-head pruning and movement/topK
structured sparsity, FLOPs accounting, and data-parallel eval/finetune over
a jax.sharding.Mesh.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
