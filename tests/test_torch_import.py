"""Logits parity: reference PyTorch ViT vs our Flax ViT with imported weights.

Imports the actual reference model code (read-only, via sys.path) with a
minimal torchvision stub (torchvision functions are only needed at call time
by augmentation ops this test never invokes), builds randomly-initialized
reference models, converts their state dicts with ``torch_import``, and
asserts forward-pass logits match to float32 tolerance.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _stub_torchvision():
    if "torchvision" in sys.modules:
        return

    def _unavailable(*a, **k):
        raise RuntimeError("torchvision stub: not available in tests")

    tv = types.ModuleType("torchvision")
    tv_tr = types.ModuleType("torchvision.transforms")
    tv_f = types.ModuleType("torchvision.transforms.functional")

    class _Interp:
        NEAREST = "nearest"
        BILINEAR = "bilinear"

    tv_f.__getattr__ = lambda name: _unavailable
    tv_tr.InterpolationMode = _Interp
    tv_tr.functional = tv_f
    tv.transforms = tv_tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv_tr
    sys.modules["torchvision.transforms.functional"] = tv_f


_stub_torchvision()
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

try:
    from models import plainvit as ref_vit

    HAVE_REF = True
except Exception:
    HAVE_REF = False

import jax.numpy as jnp  # noqa: E402

from rgbnomore_tpu.models import ViT  # noqa: E402
from rgbnomore_tpu.train.torch_import import import_vit_state_dict  # noqa: E402

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference repo not importable")

DIMS = dict(emb_size=48, depth=2, num_heads=2, head_size=24, n_classes=5)


def _compare(ref_model, flax_model, torch_inputs, jax_inputs, ver, subblock, space):
    ref_model.eval()
    with torch.no_grad():
        ref_out = ref_model(*torch_inputs).numpy()
    params = import_vit_state_dict(
        ref_model.state_dict(),
        num_heads=DIMS["num_heads"], head_size=DIMS["head_size"], depth=DIMS["depth"],
        ver=ver, use_subblock=subblock, pixel_space=space,
    )
    out = np.asarray(flax_model.apply({"params": params}, *jax_inputs))
    np.testing.assert_allclose(out, ref_out, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("ver,subblock", [(1, True), (1, False), (2, True), (2, False), (3, True)])
def test_dct_vit_logits_parity(rng, ver, subblock):
    torch.manual_seed(0)
    ref = ref_vit.ViT(
        patch_size=16, emb_size=DIMS["emb_size"], depth=DIMS["depth"],
        n_classes=DIMS["n_classes"], drop_p=0.0, pixel_space="DCT", ver=ver,
        use_subblock=subblock, num_heads=DIMS["num_heads"], head_size=DIMS["head_size"],
    )
    ours = ViT(
        patch_size=16, emb_size=DIMS["emb_size"], depth=DIMS["depth"],
        num_heads=DIMS["num_heads"], head_size=DIMS["head_size"],
        n_classes=DIMS["n_classes"], drop_p=0.0, pixel_space="DCT", ver=ver,
        use_subblock=subblock,
    )
    y = rng.standard_normal((2, 1, 8, 8, 8, 8)).astype(np.float32)
    c = rng.standard_normal((2, 2, 4, 4, 8, 8)).astype(np.float32)
    _compare(ref, ours, (torch.from_numpy(y), torch.from_numpy(c)),
             (jnp.asarray(y), jnp.asarray(c)), ver, subblock, "DCT")


def test_rgb_vit_logits_parity(rng):
    torch.manual_seed(0)
    ref = ref_vit.ViT(
        in_channels=3, patch_size=16, emb_size=DIMS["emb_size"], depth=DIMS["depth"],
        n_classes=DIMS["n_classes"], drop_p=0.0, pixel_space="RGB",
        num_heads=DIMS["num_heads"], head_size=DIMS["head_size"],
    )
    ours = ViT(
        patch_size=16, emb_size=DIMS["emb_size"], depth=DIMS["depth"],
        num_heads=DIMS["num_heads"], head_size=DIMS["head_size"],
        n_classes=DIMS["n_classes"], drop_p=0.0, pixel_space="RGB",
    )
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    _compare(ref, ours, (torch.from_numpy(x),), (jnp.asarray(x),), 1, True, "RGB")


def test_checkpoint_dict_format(tmp_path, rng):
    """The reference's epoch-checkpoint dict format loads too."""
    from rgbnomore_tpu.train.torch_import import load_torch_checkpoint

    torch.manual_seed(1)
    ref = ref_vit.ViT(
        patch_size=16, emb_size=DIMS["emb_size"], depth=DIMS["depth"],
        n_classes=DIMS["n_classes"], drop_p=0.0, pixel_space="DCT", ver=1,
        num_heads=DIMS["num_heads"], head_size=DIMS["head_size"],
    )
    ckpt = {"epoch": 3, "model_state_dict": ref.state_dict(), "loss": 1.0}
    p = tmp_path / "ref.ckpt"
    torch.save(ckpt, p)
    params = load_torch_checkpoint(
        str(p), num_heads=DIMS["num_heads"], head_size=DIMS["head_size"],
        depth=DIMS["depth"], ver=1, use_subblock=True, pixel_space="DCT",
    )
    assert "encoder_1" in params and "patchembed" in params
