"""Flax models: ViT (with DCT patch embeddings) and SwinV2."""

from rgbnomore_tpu.models.vit import ViT
from rgbnomore_tpu.models.swinv2 import SwinTransformerV2
