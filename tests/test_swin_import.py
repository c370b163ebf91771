"""SwinV2 logits parity: reference PyTorch SwinV2 vs ours with imported weights.

The reference swinv2.py needs timm; only three symbols are used
(DropPath/to_2tuple/trunc_normal_), so a minimal stub suffices to instantiate
it (drop_path_rate=0 never constructs DropPath).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# --- stub torchvision (for plainvit import chain) and timm ------------------
from tests.test_torch_import import _stub_torchvision  # noqa: E402

_stub_torchvision()

if "timm" not in sys.modules:
    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    timm_layers.DropPath = torch.nn.Identity  # only used when drop_path > 0
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm_models.layers = timm_layers
    timm.models = timm_models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

try:
    from models import swinv2 as ref_swin

    HAVE_REF = True
except Exception:
    HAVE_REF = False

import jax.numpy as jnp  # noqa: E402

from rgbnomore_tpu.models import SwinTransformerV2  # noqa: E402
from rgbnomore_tpu.train.torch_import import import_swin_state_dict  # noqa: E402

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference swin not importable")

CFG = dict(
    img_size=64, patch_size=4, num_classes=5, embed_dim=24,
    depths=(1, 1), num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
)


def test_swin_rgb_logits_parity(rng):
    torch.manual_seed(0)
    ref = ref_swin.SwinTransformerV2(
        img_size=64, patch_size=4, in_chans=3, num_classes=5, embed_dim=24,
        depths=[1, 1], num_heads=[2, 4], window_size=4, drop_path_rate=0.0,
        pixel_space="rgb",
    )
    ref.eval()
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    ours = SwinTransformerV2(pixel_space="rgb", **CFG)
    params = import_swin_state_dict(ref.state_dict(), depths=(1, 1), pixel_space="RGB")
    out = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-3)


def test_swin_dct_logits_parity(rng):
    torch.manual_seed(1)
    ref = ref_swin.SwinTransformerV2(
        img_size=64, patch_size=4, num_classes=5, embed_dim=24,
        depths=[1, 1], num_heads=[2, 4], window_size=4, drop_path_rate=0.0,
        pixel_space="dct",
    )
    ref.eval()
    y = rng.standard_normal((2, 1, 8, 8, 8, 8)).astype(np.float32)
    c = rng.standard_normal((2, 2, 4, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(y), torch.from_numpy(c)).numpy()

    ours = SwinTransformerV2(pixel_space="dct", **CFG)
    params = import_swin_state_dict(ref.state_dict(), depths=(1, 1), pixel_space="DCT")
    out = np.asarray(ours.apply({"params": params}, jnp.asarray(y), jnp.asarray(c)))
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-3)
