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
