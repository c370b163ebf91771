"""DCT coefficient algebra for TPU.

All functions operate on JPEG-style block-DCT coefficient arrays laid out as
``(C, H, W, KH, KW)`` (single sample) or ``(B, C, H, W, KH, KW)`` (batched),
where ``H, W`` index the 8x8 block grid and ``KH = KW = 8`` are the
intra-block frequency coordinates.  Everything is pure JAX and jit/vmap-safe;
static configuration (sizes, factors) is resolved at trace time.
"""

from rgbnomore_tpu.ops.basis import (
    dct_basis_matrix,
    fourier_basis_matrix,
    conversion_matrix,
    conversion_matrix_dft,
    expand_basis_blockwise,
    resize_axis_operator,
)
from rgbnomore_tpu.ops.blocks import (
    blockshift,
    iblockshift,
    combine_blocks,
    decompose_blocks,
    combine_blocks_dft,
    decompose_blocks_dft,
    upsample_dct,
    downsample_dct,
    resize_dct,
    crop_dct,
    flip_dct,
    rotate_dct_90deg,
)
from rgbnomore_tpu.ops.photometric import (
    invert_dct,
    solarize_dct,
    solarize_add_dct,
    sharpblur_dct,
    midfreqaug_dct,
    translate_dct,
    cutout_dct,
    brightness_dct,
    contrast_dct,
    autocontrast_dct,
    posterize_dct,
    equalize_dct,
    freq_enhance_dct,
    DCT_MIN,
    DCT_MAX,
)
from rgbnomore_tpu.ops.geometry import rotate_block, shear_block
