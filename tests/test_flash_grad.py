"""Flash-attention custom VJP vs autodiff of the explicit oracle."""

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
        (1, 2, 128, 128, 40),
        (1, 1, 128, 256, 64),   # nk != nq
        (1, 1, 128, 77, 64),    # padded KV
    ],
)
def test_flash_grads_match_reference(b, h, nq, nk, d):
    kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(kq, (b, h, nq, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, nk, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, nk, d), jnp.float32)
    cot = jax.random.normal(kg, (b, h, nq, d), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=128, block_k=128) * cot)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v) * cot)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, rtol=2e-4,
            err_msg=f"d{name}",
        )


def test_flash_forward_still_matches():
    kq = jax.random.PRNGKey(1)
    q = jax.random.normal(kq, (2, 2, 256, 40), jnp.float32)
    out = flash_attention(q, q, q, block_q=128, block_k=128)
    ref = reference_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
