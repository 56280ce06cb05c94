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


@pytest.mark.parametrize("d", [40, 64])
def test_flash_transposed_layout_matches_classic(d, monkeypatch):
    """The no-bias inference primal dispatches to the transposed-layout
    kernel (_fwd_kernel_t) at head_dim < 128; IEF_FLASH_T=0 must restore the
    classic layout, and both must agree with the O(N^2) reference. The jit
    cache is cleared between variants — the env switch is read at TRACE
    time, so a stale cache entry would silently serve the other variant."""
    from image_editing_framework_tpu.ops import flash_attention as fa

    kq, kk, kv = jax.random.split(jax.random.PRNGKey(7 + d), 3)
    q = jax.random.normal(kq, (2, 3, 256, d), jnp.float32)
    k = jax.random.normal(kk, (2, 3, 131, d), jnp.float32)  # padded-KV path
    v = jax.random.normal(kv, (2, 3, 131, d), jnp.float32)
    ref = np.asarray(reference_attention(q, k, v))

    fa.flash_attention.clear_cache()
    assert fa._use_t_layout(d)
    out_t = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128))

    monkeypatch.setenv("IEF_FLASH_T", "0")
    fa.flash_attention.clear_cache()
    assert not fa._use_t_layout(d)
    out_c = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128))
    fa.flash_attention.clear_cache()

    np.testing.assert_allclose(out_t, ref, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(out_c, ref, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(out_t, out_c, atol=2e-5, rtol=2e-5)


def test_flash_fwd_lse_transposed_matches_classic():
    """The CP local step (flash_attention_fwd_lse) also dispatches to the
    transposed layout at d <= 64 without bias; its (out, lse) must equal the
    classic kernel's — the ring merge and the ring VJP's classic recompute
    consume them interchangeably."""
    from image_editing_framework_tpu.ops import flash_attention as fa

    kq, kk, kv = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(kq, (2, 2, 256, 64), jnp.float32)
    k = jax.random.normal(kk, (2, 2, 200, 64), jnp.float32)  # padded KV
    v = jax.random.normal(kv, (2, 2, 200, 64), jnp.float32)

    out_t, lse_t = fa.flash_attention_fwd_lse(q, k, v, block_q=128,
                                              block_k=128)
    import os as _os

    _os.environ["IEF_FLASH_T"] = "0"
    try:
        out_c, lse_c = fa.flash_attention_fwd_lse(q, k, v, block_q=128,
                                                  block_k=128)
    finally:
        _os.environ.pop("IEF_FLASH_T", None)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_c),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(lse_t), np.asarray(lse_c),
                               atol=2e-5, rtol=2e-5)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_transposed_layout_under_vmap_and_grad_dispatch():
    """vmapped editing programs wrap flash_attention in vmap; the transposed
    primal must hold there, and differentiation must agree with the oracle
    (at this short length the VJP's auto rule keeps the classic backward
    kernels; test_flash_grad.py forces and checks the T backward)."""
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(kq, (2, 1, 2, 128, 40), jnp.float32)
    k = jax.random.normal(kk, (2, 1, 2, 128, 40), jnp.float32)
    v = jax.random.normal(kv, (2, 1, 2, 128, 40), jnp.float32)
    out = jax.vmap(
        lambda a, b, c: flash_attention(a, b, c, block_q=128, block_k=128)
    )(q, k, v)
    ref = jax.vmap(reference_attention)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )

    def loss(qq):
        return flash_attention(qq, k[0], v[0], block_q=128, block_k=128).sum()

    g = jax.grad(loss)(q[0])

    def loss_ref(qq):
        return reference_attention(qq, k[0], v[0]).sum()

    g_ref = jax.grad(loss_ref)(q[0])
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), atol=2e-4, rtol=2e-4
    )
