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


@pytest.mark.parametrize(
    "b,h,nq,nk,d",
    [
        (1, 2, 128, 128, 40),   # SD head dim — T backward default
        (1, 1, 128, 256, 64),   # XL head dim, nk != nq
        (1, 1, 128, 77, 64),    # padded KV through the T backward's masking
    ],
)
def test_flash_bwd_transposed_matches_classic(b, h, nq, nk, d, monkeypatch):
    """At d <= 64 without bias the VJP dispatches to the transposed-layout
    backward kernels (_bwd_impl_t) for production-length sequences
    (auto rule: nq >= 4096, a measured perf threshold); IEF_FLASH_BWD_T=1
    forces the T kernels at these tiny test shapes and =0 restores the
    classic kernels — both must produce the same (dq, dk, dv). The env
    switch is read at trace time, so jit caches are cleared between
    variants."""
    from image_editing_framework_tpu.ops import flash_attention as fa

    kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(5 + d), 4)
    q = jax.random.normal(kq, (b, h, nq, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, nk, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, nk, d), jnp.float32)
    cot = jax.random.normal(kg, (b, h, nq, d), jnp.float32)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=128, block_k=128) * cot)

    # auto rule: on at production length, off below the threshold
    assert fa._use_bwd_t_layout(d, 4096)
    assert not fa._use_bwd_t_layout(d, 1024)

    monkeypatch.setenv("IEF_FLASH_BWD_T", "1")
    assert fa._use_bwd_t_layout(d, nq)
    jax.clear_caches()
    g_t = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    monkeypatch.setenv("IEF_FLASH_BWD_T", "0")
    assert not fa._use_bwd_t_layout(d, nq)
    jax.clear_caches()
    g_c = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.delenv("IEF_FLASH_BWD_T")
    jax.clear_caches()

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v) * cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gt, gc, gr, name in zip(g_t, g_c, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gt), np.asarray(gc), atol=2e-5, rtol=2e-5,
            err_msg=f"T vs classic d{name}",
        )
        np.testing.assert_allclose(
            np.asarray(gt), np.asarray(gr), atol=2e-4, rtol=2e-4,
            err_msg=f"T vs oracle d{name}",
        )


def test_flash_bwd_block_transposed_matches_classic():
    """The ring-CP per-block backward (flash_attention_bwd_block) dispatches
    to the transposed layout too; against global lse it must match the
    classic per-block grads bit-for-tolerance."""
    from image_editing_framework_tpu.ops import flash_attention as fa

    kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(17), 4)
    q = jax.random.normal(kq, (2, 2, 128, 40), jnp.float32)
    k = jax.random.normal(kk, (2, 2, 128, 40), jnp.float32)
    v = jax.random.normal(kv, (2, 2, 128, 40), jnp.float32)
    g = jax.random.normal(kg, (2, 2, 128, 40), jnp.float32)
    out, lse = fa.flash_attention_fwd_lse(q, k, v, block_q=128, block_k=128)

    import os as _os

    _os.environ["IEF_FLASH_BWD_T"] = "1"  # force T at this tiny shape
    try:
        jax.clear_caches()
        t = fa.flash_attention_bwd_block(q, k, v, None, out, g, lse,
                                         block_q=128, block_k=128)
        _os.environ["IEF_FLASH_BWD_T"] = "0"
        jax.clear_caches()
        c = fa.flash_attention_bwd_block(q, k, v, None, out, g, lse,
                                         block_q=128, block_k=128)
    finally:
        _os.environ.pop("IEF_FLASH_BWD_T", None)
    jax.clear_caches()
    for a, b_, name in zip(t, c, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-5, rtol=2e-5,
            err_msg=f"d{name}",
        )


def test_flash_forward_still_matches():
    kq = jax.random.PRNGKey(1)
    q = jax.random.normal(kq, (2, 2, 256, 40), jnp.float32)
    out = flash_attention(q, q, q, block_q=128, block_k=128)
    ref = reference_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
