"""Fused Pallas attention: forward + gradient parity vs the einsum reference.

Runs in Pallas interpreter mode so the kernels are exercised on the CPU test
backend; on TPU the same kernels compile via Mosaic.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgbnomore_tpu.ops.pallas.attention import fused_attention


def _ref_attention(q, k, v, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    att = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", att, v)


@pytest.mark.parametrize("n,d", [(196, 64), (49, 32), (128, 128)])
def test_forward_parity(rng, n, d):
    b, h = 2, 3
    q = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    scale = 1.0 / 192**0.5
    out = fused_attention(q, k, v, scale, True)
    ref = _ref_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_gradient_parity(rng):
    b, h, n, d = 1, 2, 52, 24
    q = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    scale = 0.13

    def loss_fused(q, k, v):
        return jnp.sum((fused_attention(q, k, v, scale, True) - t) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((_ref_attention(q, k, v, scale) - t) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4, rtol=1e-3)


def test_jit_and_vit_integration(rng):
    """The ViT einsum fallback (CPU) and the kernel agree through the model."""
    from rgbnomore_tpu.models import ViT

    y = jnp.asarray(rng.standard_normal((2, 1, 8, 8, 8, 8)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((2, 2, 4, 4, 8, 8)).astype(np.float32))
    model = ViT(pixel_space="DCT", ver=1, patch_size=16, emb_size=48, depth=2,
                num_heads=2, head_size=24, n_classes=5, drop_p=0.0)
    params = model.init(jax.random.PRNGKey(0), y, c)
    out = jax.jit(lambda p: model.apply(p, y, c))(params)
    assert np.isfinite(np.asarray(out)).all()


def _ref_window_attention(q, k, v, bias2):
    """Per-window softmax(QK^T + per-window bias) V oracle."""
    bw, h, n, d = q.shape
    npat = bias2.shape[0]
    outs = []
    for w in range(bw):
        pair, slot = w // 2, w % 2
        b = bias2[pair % npat][:, slot * n:(slot + 1) * n, slot * n:(slot + 1) * n]
        s = jnp.einsum("hqd,hkd->hqk", q[w], k[w]) + b
        p = jax.nn.softmax(s, axis=-1)
        outs.append(jnp.einsum("hqk,hkd->hqd", p, v[w]))
    return jnp.stack(outs)


def _window_inputs(rng, bw=4, h=2, n=16, d=8, npat=2):
    q = jnp.asarray(rng.standard_normal((bw, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((bw, h, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((bw, h, n, d)).astype(np.float32))
    per = rng.standard_normal((npat, 2, h, n, n)).astype(np.float32)
    bias2 = np.full((npat, h, 2 * n, 2 * n), -1e9, np.float32)
    bias2[:, :, :n, :n] = per[:, 0]
    bias2[:, :, n:, n:] = per[:, 1]
    return q, k, v, jnp.asarray(bias2)


def test_fused_window_attention_forward(rng):
    from rgbnomore_tpu.ops.pallas.attention import fused_window_attention

    q, k, v, bias2 = _window_inputs(rng)
    out = fused_window_attention(q, k, v, bias2, True)
    want = _ref_window_attention(q, k, v, bias2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5, rtol=1e-5)


def test_fused_window_attention_grads(rng):
    from rgbnomore_tpu.ops.pallas.attention import fused_window_attention

    q, k, v, bias2 = _window_inputs(rng, bw=8, npat=2)
    t = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))

    def loss_fused(q, k, v, b):
        return jnp.sum((fused_window_attention(q, k, v, b, True) - t) ** 2)

    def loss_ref(q, k, v, b):
        return jnp.sum((_ref_window_attention(q, k, v, b) - t) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias2)
    for name, a, b_ in zip("qkvb", gf, gr):
        if name == "b":
            # off-diagonal quadrants get ~0 grads both ways; compare diags
            n = q.shape[2]
            a = jnp.concatenate([a[:, :, :n, :n], a[:, :, n:, n:]])
            b_ = jnp.concatenate([b_[:, :, :n, :n], b_[:, :, n:, n:]])
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4, rtol=1e-3,
                                   err_msg=f"grad {name}")


def test_fused_window_attention_bias_grad_deep_accumulation(rng):
    """Accumulation depth m = pairs/npat = 3: the db output block is revisited
    across grid steps — the pattern the (npat, h, m) backward grid makes legal
    (consecutive revisits) where the old (pairs, h) grid read stale VMEM."""
    from rgbnomore_tpu.ops.pallas.attention import fused_window_attention

    q, k, v, bias2 = _window_inputs(rng, bw=12, npat=2)

    def loss_fused(b):
        return jnp.sum(fused_window_attention(q, k, v, b, True) ** 2)

    def loss_ref(b):
        return jnp.sum(_ref_window_attention(q, k, v, b) ** 2)

    gf = jax.grad(loss_fused)(bias2)
    gr = jax.grad(loss_ref)(bias2)
    n = q.shape[2]
    for sl in (np.s_[:, :, :n, :n], np.s_[:, :, n:, n:]):
        np.testing.assert_allclose(np.asarray(gf[sl]), np.asarray(gr[sl]),
                                   atol=5e-4, rtol=1e-3)
