import jax
import jax.numpy as jnp

from rgbnomore_tpu.utils.profiling import Timer, compiled_cost, model_flops


def test_compiled_cost_reports_flops():
    cost = compiled_cost(lambda a, b: a @ b, jnp.ones((64, 64)), jnp.ones((64, 64)))
    assert cost.get("flops", 0) >= 2 * 64 * 64 * 64 * 0.5  # at least the matmul


def test_model_flops_vit():
    from rgbnomore_tpu.models import ViT

    model = ViT(pixel_space="DCT", ver=1, patch_size=16, emb_size=48, depth=2,
                num_heads=2, head_size=24, n_classes=5, drop_p=0.0)
    y = jnp.zeros((1, 1, 8, 8, 8, 8))
    c = jnp.zeros((1, 2, 4, 4, 8, 8))
    params = model.init(jax.random.PRNGKey(0), y, c)
    flops = model_flops(model, params, y, c)
    assert flops > 1e6  # a real forward pass, not dormant accounting


def test_timer():
    with Timer() as t:
        jnp.ones((8, 8)).block_until_ready()
    assert t.elapsed > 0
