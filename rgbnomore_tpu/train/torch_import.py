"""Import reference (PyTorch) ViT checkpoints into the Flax parameter tree.

Enables checkpoint-level parity evaluation against the released ``.pth``
weights (``README.md:27-44`` of the reference): the name mapping follows the
reference module structure (``models/plainvit.py``), including the fused-QKV
interleaving quirk — the reference splits its qkv output as
``(h d qkv)`` (``plainvit.py:447``), i.e. q/k/v interleaved per (head, dim)
with stride 1, whereas this implementation splits into contiguous thirds —
the importer permutes accordingly.

Accepts raw state dicts, the reference's checkpoint dicts
(``{'model_state_dict': ...}``), and DDP-prefixed names (``module.*``).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

__all__ = ["import_vit_state_dict", "load_torch_checkpoint"]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _linear(sd: Mapping, prefix: str) -> dict:
    return {"kernel": _np(sd[f"{prefix}.weight"]).T, "bias": _np(sd[f"{prefix}.bias"])}


def _layernorm(sd: Mapping, prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _qkv(sd: Mapping, prefix: str, num_heads: int, head_size: int) -> dict:
    """Permute the reference's (h, d, qkv)-interleaved fused QKV to (qkv, h, d)."""
    w = _np(sd[f"{prefix}.weight"])  # (3*h*d, in), rows ordered (h, d, qkv)
    b = _np(sd[f"{prefix}.bias"])
    in_dim = w.shape[1]
    w = w.reshape(num_heads, head_size, 3, in_dim).transpose(2, 0, 1, 3)
    b = b.reshape(num_heads, head_size, 3).transpose(2, 0, 1)
    return {"kernel": w.reshape(3 * num_heads * head_size, in_dim).T,
            "bias": b.reshape(-1)}


def _strip_prefixes(sd: Mapping) -> dict:
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v
    return out


def import_vit_state_dict(
    state_dict: Mapping,
    *,
    num_heads: int,
    head_size: int,
    depth: int,
    ver: int = 1,
    use_subblock: bool = True,
    pixel_space: str = "DCT",
) -> dict:
    """Convert a reference ViT state dict to this framework's param tree."""
    sd = _strip_prefixes(state_dict)
    params: dict = {}

    # --- patch embedding ---------------------------------------------------
    pe: dict = {}
    if pixel_space.upper() == "RGB":
        w = _np(sd["patchembed.projection.0.weight"])  # (E, 3, P, P)
        pe["projection"] = {
            "kernel": w.transpose(2, 3, 1, 0),  # (P, P, in, E) flax conv
            "bias": _np(sd["patchembed.projection.0.bias"]),
        }
    elif ver == 1:
        pe["projection"] = _linear(sd, "patchembed.projection.0")
    elif ver == 2 and use_subblock:
        pe["projection_y"] = _linear(sd, "patchembed.projection_Y.1")
        pe["projection_c"] = _linear(sd, "patchembed.projection_C.1")
        pe["linear_mix"] = _linear(sd, "patchembed.linearMix")
    elif ver == 2:
        i = 0
        while f"patchembed.LinearY.{i}.weight" in sd:
            pe[f"linear_y{i}"] = _linear(sd, f"patchembed.LinearY.{i}")
            i += 1
        i = 0
        while f"patchembed.LinearC.{i}.weight" in sd:
            pe[f"linear_c{i}"] = _linear(sd, f"patchembed.LinearC.{i}")
            i += 1
        pe["linear_mix"] = _linear(sd, "patchembed.LinearMix")
    elif ver == 3:
        pe["projection_y"] = _linear(sd, "patchembed.projectionY.1")
        pe["projection_c"] = _linear(sd, "patchembed.projectionC.1")
    params["patchembed"] = pe

    # --- encoder blocks ------------------------------------------------------
    for i in range(depth):
        blk = f"encoder.{i}"
        params[f"encoder_{i}"] = {
            "ln1": _layernorm(sd, f"{blk}.0.fn.eb_lrnorm1"),
            "mha": {
                "qkv": _qkv(sd, f"{blk}.0.fn.eb_mha.qkv", num_heads, head_size),
                "projection": _linear(sd, f"{blk}.0.fn.eb_mha.projection"),
            },
            "ln2": _layernorm(sd, f"{blk}.1.fn.eb_lrnorm2"),
            "mlp1": _linear(sd, f"{blk}.1.fn.eb_ffb.0"),
            "mlp2": _linear(sd, f"{blk}.1.fn.eb_ffb.3"),
        }

    # --- head ----------------------------------------------------------------
    params["head"] = {
        "ln": _layernorm(sd, "classhead.ch_lrnorm"),
        "linear1": _linear(sd, "classhead.ch_linear1"),
        "linear2": _linear(sd, "classhead.ch_linear2"),
    }
    return params


def import_swin_state_dict(
    state_dict: Mapping,
    *,
    depths=(2, 2, 6, 2),
    pixel_space: str = "DCT",
) -> dict:
    """Convert a reference SwinV2 state dict (``models/swinv2.py``) to the
    Flax tree of :class:`rgbnomore_tpu.models.SwinTransformerV2`.

    The reference's fused qkv is laid out (qkv, head, dim) — the same order
    this implementation splits — so kernels transpose without permutation.
    Buffers (coords tables, attention masks) are recomputed at trace time and
    skipped here.
    """
    sd = _strip_prefixes(state_dict)
    params: dict = {}

    pe: dict = {}
    if pixel_space.upper() == "RGB":
        w = _np(sd["patch_embed.proj.weight"])  # (E, C, P, P)
        params["patch_embed"] = {
            "kernel": w.transpose(2, 3, 1, 0),
            "bias": _np(sd["patch_embed.proj.bias"]),
        }
        if "patch_embed.norm.weight" in sd:
            params["patch_norm"] = _layernorm(sd, "patch_embed.norm")
    else:
        pe["projection"] = _linear(sd, "patch_embed.projection.0")
        if "patch_embed.norm.weight" in sd:
            pe["norm"] = _layernorm(sd, "patch_embed.norm")
        params["patch_embed"] = pe

    for i, depth in enumerate(depths):
        for d in range(depth):
            blk = f"layers.{i}.blocks.{d}"
            attn = {
                "logit_scale": _np(sd[f"{blk}.attn.logit_scale"]),
                "qkv_kernel": _np(sd[f"{blk}.attn.qkv.weight"]).T,
                "cpb_mlp1": _linear(sd, f"{blk}.attn.cpb_mlp.0"),
                "cpb_mlp2": {"kernel": _np(sd[f"{blk}.attn.cpb_mlp.2.weight"]).T},
                "proj": _linear(sd, f"{blk}.attn.proj"),
            }
            if f"{blk}.attn.q_bias" in sd:
                attn["q_bias"] = _np(sd[f"{blk}.attn.q_bias"])
                attn["v_bias"] = _np(sd[f"{blk}.attn.v_bias"])
            params[f"layer{i}_block{d}"] = {
                "attn": attn,
                "norm1": _layernorm(sd, f"{blk}.norm1"),
                "norm2": _layernorm(sd, f"{blk}.norm2"),
                "mlp1": _linear(sd, f"{blk}.mlp.fc1"),
                "mlp2": _linear(sd, f"{blk}.mlp.fc2"),
            }
        if f"layers.{i}.downsample.reduction.weight" in sd:
            params[f"layer{i}_downsample"] = {
                "reduction": {"kernel": _np(sd[f"layers.{i}.downsample.reduction.weight"]).T},
                "norm": _layernorm(sd, f"layers.{i}.downsample.norm"),
            }

    params["norm"] = _layernorm(sd, "norm")
    params["head"] = _linear(sd, "head")
    if "absolute_pos_embed" in sd:
        params["absolute_pos_embed"] = _np(sd["absolute_pos_embed"])
    return params


def load_torch_checkpoint(path: str, **kwargs) -> dict:
    """Load a reference ``.pth`` / ``.ckpt`` file and convert it.

    Handles both the bare final ``state_dict`` (``train.py:203``) and the
    epoch checkpoint dict (``pipeline_utils.py:490-516``).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(blob, dict) and "model_state_dict" in blob:
        blob = blob["model_state_dict"]
    return import_vit_state_dict(blob, **kwargs)
