"""Pallas TPU kernels for the hot compute paths."""

from rgbnomore_tpu.ops.pallas.attention import fused_attention
