import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_editing_framework_tpu.ops.flash_attention import (
    flash_attention,
    reference_attention,
)


@pytest.mark.parametrize(
    "b,h,nq,nk,d",
    [
        (2, 4, 256, 256, 40),   # SD1.5 res-16 shape (head dim 40)
        (1, 2, 64, 64, 160),    # res-8
        (2, 2, 1024, 1024, 80), # res-32
        (1, 1, 256, 512, 64),   # cross-shaped / union KV (nk != nq)
        (1, 1, 128, 77, 64),    # padded-KV path (77 not multiple of block)
    ],
)
def test_flash_matches_reference(b, h, nq, nk, d):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, nq, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, nk, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, nk, d), jnp.float32)
    out = flash_attention(q, k, v, block_q=128, block_k=128)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_bf16():
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (1, 2, 256, 64), jnp.bfloat16)
    out = flash_attention(q, q, q, block_q=128, block_k=128)
    ref = reference_attention(q, q, q)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )
