"""Parity tests for the fused Pallas input-pipeline kernel
(ops/pallas/augpipe.py, interpret mode) against the XLA switch path.

Both paths consume the SAME RandAugmentDCT.draw_policy decisions, so for a
given rng the pipelines must produce (near-)identical outputs; tolerances
cover float re-association only (masked-lane reductions / affine ToRange
vs the reference's two-step form).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbnomore_tpu.augment.pipeline import make_cropped_train_pipeline, to_range
from rgbnomore_tpu.augment.randaugment import RandAugmentDCT
from rgbnomore_tpu.ops.pallas.augpipe import SUPPORTED_OPS, fused_flip_aug_range
from rgbnomore_tpu.ops.photometric import clamp_dct
from rgbnomore_tpu.train.config import AUGLIST_DCT, AUGLIST_DCT_VITTI


def _rand_coeffs(rng, b=3, h=12, w=12):
    ky, kc = jax.random.split(rng)
    y = jax.random.uniform(ky, (b, 1, h, w, 8, 8), minval=-1100, maxval=1100)
    c = jax.random.uniform(kc, (b, 2, h // 2, w // 2, 8, 8), minval=-1100, maxval=1100)
    return y, c


def _ref_apply(aug: RandAugmentDCT, policy, flip, y, c):
    """The XLA path with EXPLICIT policy/flip (mirrors the fused kernel's
    contract): flip -> clamp -> switch rounds -> ToRange."""
    from rgbnomore_tpu.ops import blocks

    fy = blocks.flip_dct(y, "horizontal")
    fc = blocks.flip_dct(c, "horizontal")
    sel = flip.reshape(-1, 1, 1, 1, 1, 1)
    y = jnp.where(sel, fy, y)
    c = jnp.where(sel, fc, c)
    ops = aug._ops

    def per_sample(y1, c1, idx, sign, ch, cw, drop):
        y1, c1 = clamp_dct(y1), clamp_dct(c1)

        def body(carry, xs):
            y1, c1 = carry
            y1, c1 = jax.lax.switch(xs[0], ops, y1, c1, xs[1:])
            return (y1, c1), None

        (y1, c1), _ = jax.lax.scan(body, (y1, c1), (idx, sign, ch, cw, drop))
        return y1, c1

    y, c = jax.vmap(per_sample)(y, c, *policy)
    return to_range(y), to_range(c)


@pytest.mark.parametrize("name", sorted(SUPPORTED_OPS))
def test_each_op_matches_reference_branch(name):
    rng = jax.random.PRNGKey(hash(name) % 2**31)
    y, c = _rand_coeffs(rng)
    b, h, w = y.shape[0], y.shape[2], y.shape[3]
    aug = RandAugmentDCT(ops_list=[name], num_ops=1, magnitude=5, grid=h)
    idx = jnp.zeros((b, 1), jnp.int32)
    sign = jnp.asarray([[1.0], [-1.0], [1.0]])[:b]
    ch = jnp.asarray([[4], [0], [10]])[:b]
    cw = jnp.asarray([[6], [2], [0]])[:b]
    drop = jnp.asarray([[1], [0], [1]])[:b]
    flip = jnp.asarray([False, True, False])[:b]
    policy = (idx, sign, ch, cw, drop)

    ref_y, ref_c = _ref_apply(aug, policy, flip, y, c)
    out_y, out_c = fused_flip_aug_range(
        y, c, policy, flip, ops_list=[name], num_ops=1, magnitude=5,
        interpret=True,
    )
    np.testing.assert_allclose(out_y, ref_y, atol=2e-6, rtol=0)
    np.testing.assert_allclose(out_c, ref_c, atol=2e-6, rtol=0)


@pytest.mark.parametrize("auglist", [AUGLIST_DCT_VITTI, AUGLIST_DCT])
def test_full_preset_policy_matches(auglist):
    rng = jax.random.PRNGKey(7)
    y, c = _rand_coeffs(rng, b=6, h=12, w=12)
    aug = RandAugmentDCT(ops_list=list(auglist), num_ops=2, magnitude=3, grid=12)
    k_pol, k_flip = jax.random.split(jax.random.PRNGKey(11))
    policy = aug.draw_policy(k_pol, 6, 12, 12)
    flip = jax.random.bernoulli(k_flip, 0.5, (6,))

    ref_y, ref_c = _ref_apply(aug, policy, flip, y, c)
    out_y, out_c = fused_flip_aug_range(
        y, c, policy, flip, ops_list=list(auglist), num_ops=2, magnitude=3,
        interpret=True,
    )
    np.testing.assert_allclose(out_y, ref_y, atol=2e-6, rtol=0)
    np.testing.assert_allclose(out_c, ref_c, atol=2e-6, rtol=0)


def test_pipeline_fused_matches_xla(tmp_path):
    """End-to-end: the fused cropped train pipeline must equal the XLA one
    for the same rng and packed buffer (identical RNG consumption)."""
    from rgbnomore_tpu import codec
    from rgbnomore_tpu.data.index import load_index
    from rgbnomore_tpu.data.loader import DctCroppedLoader

    rng = np.random.default_rng(0)
    rows = ["Filepath,Label"]
    for i in range(4):
        img = rng.integers(0, 255, (3, 96, 96)).astype(np.uint8)
        p = tmp_path / f"i{i}.jpg"
        codec.write_tensor(p, img, quality=90)
        rows.append(f"{p},{i}")
    index = tmp_path / "index.csv"
    index.write_text("\n".join(rows) + "\n")
    ds = load_index(index)
    loader = DctCroppedLoader(ds, 4, target=8, k=16, mode="train",
                              shuffle=False, drop_last=False, seed=0,
                              num_threads=1)
    batch = next(iter(loader))
    kw = dict(target=8, auglist=list(AUGLIST_DCT_VITTI), num_ops=2,
              magnitude=3, k=16, fmt="mask16")
    pipe_xla = make_cropped_train_pipeline(**kw, fused=False)
    pipe_fused = make_cropped_train_pipeline(**kw, fused=True,
                                             fused_interpret=True)
    key = jax.random.PRNGKey(3)
    y0, c0, l0, w0 = pipe_xla(key, batch["packed"])
    y1, c1, l1, w1 = pipe_fused(key, batch["packed"])
    np.testing.assert_allclose(y1, y0, atol=2e-6, rtol=0)
    np.testing.assert_allclose(c1, c0, atol=2e-6, rtol=0)
    np.testing.assert_array_equal(l1, l0)
    np.testing.assert_array_equal(w1, w0)
