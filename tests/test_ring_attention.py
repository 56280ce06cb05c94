"""Ring / Ulysses context-parallel attention vs full attention (8-dev mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from image_editing_framework_tpu.ops.flash_attention import reference_attention
from image_editing_framework_tpu.parallel.ring_attention import (
    ring_self_attention,
    ulysses_self_attention,
)


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, axis_names=("data",))


def test_ring_attention_matches_full(mesh):
    b, h, n, d = 2, 4, 512, 32
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, h, n, d))
    k = jax.random.normal(kk, (b, h, n, d))
    v = jax.random.normal(kv, (b, h, n, d))
    out = ring_self_attention(q, k, v, mesh)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ulysses_attention_matches_full(mesh):
    b, h, n, d = 1, 8, 256, 32  # 8 heads over 8 devices
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(kq, (b, h, n, d))
    k = jax.random.normal(kk, (b, h, n, d))
    v = jax.random.normal(kv, (b, h, n, d))
    out = ulysses_self_attention(q, k, v, mesh)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_unet_with_context_parallel_matches(mesh):
    """UNet with ring-attention CP == plain UNet (8-dev mesh, low threshold)."""
    import jax.numpy as jnp
    from image_editing_framework_tpu.models import configs
    from image_editing_framework_tpu.models.unet import UNet2DCondition

    base = UNet2DCondition(configs.TINY_UNET)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 32))
    params = base.init(jax.random.PRNGKey(2), x, 10, ctx)
    ref, _ = base.apply(params, x, 10, ctx, None, None, False)

    cp = UNet2DCondition(configs.TINY_UNET, cp_mesh=mesh, cp_min_seq=64)
    out, _ = cp.apply(params, x, 10, ctx, None, None, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
