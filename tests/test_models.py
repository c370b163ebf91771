import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgbnomore_tpu.models import ViT, SwinTransformerV2
from rgbnomore_tpu.models.embeddings import sincos_position_embedding


def _dct_inputs(rng, b=2, blocks=28):
    y = jnp.asarray(rng.standard_normal((b, 1, blocks, blocks, 8, 8)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((b, 2, blocks // 2, blocks // 2, 8, 8)).astype(np.float32))
    return y, c


def _param_count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


VITTI = dict(patch_size=16, emb_size=192, depth=12, num_heads=3, head_size=64, drop_p=0.0)


def test_sincos_embedding_layout():
    emb = np.asarray(sincos_position_embedding(2, 3, 8))
    assert emb.shape == (2, 3, 8)
    # first quarter: sin of w-position at freq 0 => sin(w)
    np.testing.assert_allclose(emb[0, :, 0], np.sin(np.arange(3)), atol=1e-6)
    # third quarter start: sin of h-position
    np.testing.assert_allclose(emb[:, 0, 4], np.sin(np.arange(2)), atol=1e-6)


@pytest.mark.parametrize("ver,subblock", [(1, True), (1, False), (2, True), (2, False), (3, True)])
def test_vit_dct_variants_forward(rng, ver, subblock):
    y, c = _dct_inputs(rng)
    model = ViT(pixel_space="DCT", ver=ver, use_subblock=subblock, n_classes=10, **VITTI)
    params = model.init(jax.random.PRNGKey(0), y, c)
    out = model.apply(params, y, c)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_vit_rgb_forward(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 224, 224)).astype(np.float32))
    model = ViT(pixel_space="RGB", n_classes=10, **VITTI)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 10)


def test_vit_ti_param_count(rng):
    """ViT-Ti DCT grouped should have ~5.4M params (paper Table: JPEG-Ti ~5.6M)."""
    y, c = _dct_inputs(rng)
    model = ViT(pixel_space="DCT", ver=1, n_classes=1000, **VITTI)
    params = model.init(jax.random.PRNGKey(0), y, c)
    n = _param_count(params)
    # encoder alone: 12 * (4*192*192*... ) ~ 5.3M; embed 384*192; head ~230k
    assert 5_000_000 < n < 6_500_000, n


def test_vit_concat_has_more_tokens_same_classes(rng):
    y, c = _dct_inputs(rng)
    model = ViT(pixel_space="DCT", ver=3, n_classes=7, **VITTI)
    params = model.init(jax.random.PRNGKey(0), y, c)
    out = model.apply(params, y, c)
    assert out.shape == (2, 7)


def test_vit_jit_and_grad(rng):
    y, c = _dct_inputs(rng)
    model = ViT(pixel_space="DCT", ver=1, n_classes=10, **VITTI)
    params = model.init(jax.random.PRNGKey(0), y, c)

    @jax.jit
    def loss_fn(p):
        out = model.apply(p, y, c)
        return jnp.mean(out**2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # gradient must reach the patch embedding
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    embed_grads = [l for p, l in flat if "patchembed" in str(p)]
    assert embed_grads and any(float(jnp.abs(l).max()) > 0 for l in embed_grads)


def test_vit_dropout_active_in_train_mode(rng):
    y, c = _dct_inputs(rng)
    model = ViT(pixel_space="DCT", ver=1, n_classes=10, drop_p=0.5, patch_size=16,
                emb_size=192, depth=2, num_heads=3, head_size=64)
    params = model.init(jax.random.PRNGKey(0), y, c)
    out1 = model.apply(params, y, c, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    out2 = model.apply(params, y, c, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    out3 = model.apply(params, y, c, train=False)
    out4 = model.apply(params, y, c, train=False)
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(out4))


def test_vit_bf16_compute(rng):
    y, c = _dct_inputs(rng)
    model = ViT(pixel_space="DCT", ver=1, n_classes=10, dtype=jnp.bfloat16, **VITTI)
    params = model.init(jax.random.PRNGKey(0), y, c)
    # params stay f32
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(params))
    out = model.apply(params, y, c)
    assert out.dtype == jnp.float32  # logits promoted to f32
    assert np.isfinite(np.asarray(out)).all()


SWIN_T = dict(
    img_size=256, embed_dim=96, depths=(2, 2, 2, 2), num_heads=(3, 6, 12, 24),
    window_size=8, drop_path_rate=0.0,
)


def test_swin_rgb_forward(rng):
    x = jnp.asarray(rng.standard_normal((1, 3, 256, 256)).astype(np.float32))
    model = SwinTransformerV2(pixel_space="rgb", num_classes=5, **SWIN_T)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_swin_dct_forward(rng):
    # 256x256 image -> Y (1,32,32,8,8), CbCr (2,16,16,8,8); patch 4 -> 64x64 tokens
    y = jnp.asarray(rng.standard_normal((1, 1, 32, 32, 8, 8)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((1, 2, 16, 16, 8, 8)).astype(np.float32))
    model = SwinTransformerV2(pixel_space="dct", num_classes=5, **SWIN_T)
    params = model.init(jax.random.PRNGKey(0), y, c)
    out = model.apply(params, y, c)
    assert out.shape == (1, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_swin_t_param_count(rng):
    """SwinV2-T has ~28M params."""
    x = jnp.asarray(rng.standard_normal((1, 3, 256, 256)).astype(np.float32))
    model = SwinTransformerV2(
        pixel_space="rgb", num_classes=1000, img_size=256, embed_dim=96,
        depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24), window_size=8,
    )
    params = model.init(jax.random.PRNGKey(0), x)
    n = _param_count(params)
    assert 26_000_000 < n < 31_000_000, n


def test_swin_respostnorm_starts_as_identityish(rng):
    """With zero-init post-norms, block outputs equal the embedding path."""
    y = jnp.asarray(rng.standard_normal((1, 1, 32, 32, 8, 8)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((1, 2, 16, 16, 8, 8)).astype(np.float32))
    model = SwinTransformerV2(pixel_space="dct", num_classes=5, **SWIN_T)
    params = model.init(jax.random.PRNGKey(1), y, c)
    # norm1/norm2 scales should start at exactly zero
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    zeroed = [l for p, l in flat if "norm1" in str(p) and "scale" in str(p)]
    assert zeroed and all(float(jnp.abs(l).max()) == 0.0 for l in zeroed)


def test_vit_bf16_close_to_f32(rng):
    """bf16 compute must track f32 within mixed-precision tolerance."""
    import jax.numpy as jnp

    y = jnp.asarray(rng.standard_normal((2, 1, 8, 8, 8, 8)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((2, 2, 4, 4, 8, 8)).astype(np.float32))
    kwargs = dict(pixel_space="DCT", ver=1, patch_size=16, emb_size=192, depth=4,
                  num_heads=3, head_size=64, n_classes=50, drop_p=0.0)
    m32 = ViT(dtype=jnp.float32, **kwargs)
    m16 = ViT(dtype=jnp.bfloat16, **kwargs)
    params = m32.init(jax.random.PRNGKey(0), y, c)
    out32 = np.asarray(m32.apply(params, y, c))
    out16 = np.asarray(m16.apply(params, y, c))
    # logits agree to bf16 noise; top-1 decisions identical on clear margins
    assert np.abs(out32 - out16).max() < 0.15
    assert (out32.argmax(-1) == out16.argmax(-1)).all()


def test_bias_init_matches_torch_distribution(rng):
    """From-scratch biases follow torch's Linear default U(+-1/sqrt(fan_in))
    (round-4 learn2 bisect: zero-bias init measurably shifts training —
    REFERENCE_AB.json jax_learn2_torchinit)."""
    import jax
    import numpy as np

    from rgbnomore_tpu.models import ViT

    model = ViT(emb_size=192, depth=2, num_heads=3, head_size=64,
                n_classes=100, pixel_space="DCT", ver=1, use_subblock=True)
    y = jnp.zeros((2, 1, 28, 28, 8, 8))
    c = jnp.zeros((2, 2, 14, 14, 8, 8))
    params = model.init(jax.random.PRNGKey(3), y, c)["params"]

    checks = 0
    flat = jax.tree_util.tree_leaves_with_path(params)
    by_path = {"/".join(str(k.key) for k in p): np.asarray(v) for p, v in flat}
    for path, bias in by_path.items():
        if not path.endswith("bias") or "ln" in path or "norm" in path:
            continue
        kernel = by_path.get(path[: -len("bias")] + "kernel")
        if kernel is None or kernel.ndim < 2:
            continue
        fan_in = int(np.prod(kernel.shape[:-1]))
        bound = 1.0 / np.sqrt(fan_in)
        assert np.abs(bias).max() <= bound + 1e-7, path
        assert np.abs(bias).max() > 0, f"{path} still zero-initialized"
        if bias.size >= 100:  # distribution shape check on the bigger biases
            assert np.std(bias) > 0.4 * bound / np.sqrt(3), path
            checks += 1
    assert checks >= 3  # qkv/mlp1/mlp2/projection at least


def test_swin_paired_attention_bit_exact():
    """The XLA block-diagonal window pairing (use_paired_attention) must be
    bit-exact vs the plain einsum path: exp(-1e9) cross-window terms underflow
    to exactly 0, so the two per-window softmaxes are reproduced unchanged —
    forward AND gradients (it is a pure reshape of the same matmuls)."""
    import jax
    import jax.numpy as jnp

    from rgbnomore_tpu.models.swinv2 import SwinTransformerV2

    kw = dict(img_size=64, num_classes=7, embed_dim=24, depths=(2, 2),
              num_heads=(3, 6), window_size=8, drop_path_rate=0.0,
              pixel_space="rgb")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 64, 64))
    m0 = SwinTransformerV2(**kw, use_paired_attention=False)
    m1 = SwinTransformerV2(**kw, use_paired_attention=True)
    params = m0.init({"params": jax.random.PRNGKey(1)}, x, train=False)["params"]
    y0 = m0.apply({"params": params}, x, train=False)
    y1 = m1.apply({"params": params}, x, train=False)
    assert float(jnp.abs(y0 - y1).max()) == 0.0
    g0 = jax.grad(lambda p: m0.apply({"params": p}, x, train=False).sum())(params)
    g1 = jax.grad(lambda p: m1.apply({"params": p}, x, train=False).sum())(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        assert float(jnp.abs(a - b).max()) == 0.0
