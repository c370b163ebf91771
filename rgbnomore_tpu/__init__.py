"""rgbnomore_tpu — a TPU-native framework for minimally-decoded JPEG vision
transformers.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
JeongsooP/RGB-no-more (CVPR 2023): train and evaluate ViT / SwinV2 models on
ImageNet directly from JPEG DCT coefficients. The host performs only the
sequential libjpeg entropy decode; dequantization, DCT-domain augmentation,
patch embedding and the model itself run batched on-device inside a single
jitted SPMD step over a `jax.sharding.Mesh`.

Subpackages
-----------
- ``ops``      — pure-JAX DCT coefficient algebra (basis/conversion matrices,
                 combine/decompose, resize, flips, crops, photometric ops).
- ``augment``  — batched, jit-able augmentation policies (RandAugment in the
                 DCT domain, random resized crop, mixup).
- ``codec``    — host-side JPEG codec (C++/libjpeg extension + wrappers).
- ``data``     — index datasets, host loader, staging tools.
- ``models``   — Flax ViT + SwinV2 with the DCT patch embeddings.
- ``train``    — config system, optimizers, train/eval steps, checkpointing.
- ``parallel`` — mesh construction and sharding helpers.
"""

__version__ = "0.1.0"
