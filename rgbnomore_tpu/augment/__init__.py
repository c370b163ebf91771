"""Batched, jit-able DCT-domain augmentation policies (device-side)."""

from rgbnomore_tpu.augment.crops import (
    crop_size_candidates,
    make_random_resized_crop,
    make_center_crop_resize,
    make_full_resize,
)
from rgbnomore_tpu.augment.randaugment import RandAugmentDCT
from rgbnomore_tpu.augment.pipeline import (
    dequantize,
    to_range,
    make_train_pipeline,
    make_eval_pipeline,
)
