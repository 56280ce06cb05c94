"""Ring / Ulysses context-parallel attention vs full attention (8-dev mesh).

The kernel-path tests run the Pallas flash local step in interpret mode on
the virtual CPU mesh — same code path as TPU, minus the Mosaic compiler.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from image_editing_framework_tpu.ops.flash_attention import (
    NEG_INF,
    reference_attention,
)
from image_editing_framework_tpu.parallel.ring_attention import (
    ring_self_attention,
    ulysses_self_attention,
)


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, axis_names=("data",))


def _qkv(key, b, h, n, d, nk=None):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, n, d))
    k = jax.random.normal(kk, (b, h, nk or n, d))
    v = jax.random.normal(kv, (b, h, nk or n, d))
    return q, k, v


def _masked_reference(q, k, v, bias):
    import math

    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    s = s / math.sqrt(q.shape[-1]) + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def test_ring_attention_matches_full(mesh):
    b, h, n, d = 2, 4, 512, 32
    q, k, v = _qkv(jax.random.PRNGKey(0), b, h, n, d)
    out = ring_self_attention(q, k, v, mesh)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_ring_kernel_path_matches_full(mesh):
    """Ring with the Pallas local step (flash_attention_fwd_lse + lse merge)."""
    b, h, n, d = 1, 2, 256, 32
    q, k, v = _qkv(jax.random.PRNGKey(2), b, h, n, d)
    out = ring_self_attention(q, k, v, mesh, use_flash=True)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


@pytest.mark.slow
def test_ring_kernel_with_segment_bias(mesh):
    """MasaCtrl-union under CP: per-key segment bias rotates with K/V."""
    b, h, n, d = 1, 2, 256, 16
    q, k, v = _qkv(jax.random.PRNGKey(3), b, h, n, d)
    bias = jnp.where(
        (jnp.arange(n) % 64 < 48)[None, :], 0.0, NEG_INF
    ).astype(jnp.float32)
    bias = jnp.broadcast_to(bias, (b, n))
    out = ring_self_attention(q, k, v, mesh, bias=bias, use_flash=True)
    ref = _masked_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)
    # the XLA local step agrees too
    out_xla = ring_self_attention(q, k, v, mesh, bias=bias, use_flash=False)
    np.testing.assert_allclose(np.asarray(out_xla), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_ring_kernel_gradients_match(mesh):
    """The custom ring VJP (per-block kernel backward with global lse,
    dk/dv accumulators riding the ring) == full-attention gradients."""
    b, h, n, d = 1, 2, 128, 16
    q, k, v = _qkv(jax.random.PRNGKey(4), b, h, n, d)
    tgt = jax.random.normal(jax.random.PRNGKey(5), q.shape)

    def loss_ring(q, k, v):
        out = ring_self_attention(q, k, v, mesh, use_flash=True)
        return jnp.sum((out - tgt) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((reference_attention(q, k, v) - tgt) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, r, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=5e-3, rtol=5e-3,
            err_msg=f"d{name}",
        )


def test_ulysses_attention_matches_full(mesh):
    b, h, n, d = 1, 8, 256, 32  # 8 heads over 8 devices
    q, k, v = _qkv(jax.random.PRNGKey(1), b, h, n, d)
    out = ulysses_self_attention(q, k, v, mesh)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_ulysses_with_bias_and_grads(mesh):
    b, h, n, d = 1, 8, 128, 16
    q, k, v = _qkv(jax.random.PRNGKey(6), b, h, n, d)
    bias = jnp.where(
        (jnp.arange(n) % 32 < 24)[None, :], 0.0, NEG_INF
    ).astype(jnp.float32)
    bias = jnp.broadcast_to(bias, (b, n))
    out = ulysses_self_attention(q, k, v, mesh, bias=bias)
    ref = _masked_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    tgt = jax.random.normal(jax.random.PRNGKey(7), q.shape)

    def loss(fn):
        def f(q, k, v):
            return jnp.sum((fn(q, k, v) - tgt) ** 2)

        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    g_u = loss(lambda q, k, v: ulysses_self_attention(q, k, v, mesh, bias=bias))
    g_r = loss(lambda q, k, v: _masked_reference(q, k, v, bias))
    for a, r in zip(g_u, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-4)


def test_ulysses_ring_2d_matches_full(mesh):
    """2D CP: Ulysses over a 2-way head axis x ring over a 4-way seq axis."""
    from image_editing_framework_tpu.parallel.ring_attention import (
        ulysses_ring_attention,
    )

    mesh2d = Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4), axis_names=("tensor", "data")
    )
    b, h, n, d = 1, 4, 512, 32
    q, k, v = _qkv(jax.random.PRNGKey(8), b, h, n, d)
    out = ulysses_ring_attention(q, k, v, mesh2d, "tensor", "data")
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # with a per-key segment bias (the bias gathers in all_to_all chunk order)
    bias = jnp.where(
        (jnp.arange(n) % 64 < 48)[None, :], 0.0, NEG_INF
    ).astype(jnp.float32)
    bias = jnp.broadcast_to(bias, (b, n))
    out_b = ulysses_ring_attention(q, k, v, mesh2d, "tensor", "data", bias=bias)
    ref_b = _masked_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref_b), atol=2e-5)


@pytest.mark.slow
def test_ulysses_ring_2d_kernel_and_grads(mesh):
    from image_editing_framework_tpu.parallel.ring_attention import (
        ulysses_ring_attention,
    )

    mesh2d = Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4), axis_names=("tensor", "data")
    )
    b, h, n, d = 1, 2, 128, 16
    q, k, v = _qkv(jax.random.PRNGKey(9), b, h, n, d)
    out = ulysses_ring_attention(q, k, v, mesh2d, "tensor", "data", use_flash=True)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    tgt = jax.random.normal(jax.random.PRNGKey(10), q.shape)

    def loss(fn):
        def f(q, k, v):
            return jnp.sum((fn(q, k, v) - tgt) ** 2)

        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    g2d = loss(
        lambda q, k, v: ulysses_ring_attention(
            q, k, v, mesh2d, "tensor", "data", use_flash=True
        )
    )
    gr = loss(lambda q, k, v: reference_attention(q, k, v))
    for a, r in zip(g2d, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=5e-3, rtol=5e-3)


def test_masked_masactrl_override_under_cp(mesh):
    """MasaCtrl Mask/MaskAuto overrides thread the CP mesh: their internal
    normal/mutual/fg/bg attention calls run ring (or Ulysses) context-
    parallel and match the single-device override exactly. Semantics:
    masactrl/model/attention_control.py:142-151."""
    from image_editing_framework_tpu.ops.attention import AttnSite
    from image_editing_framework_tpu.ops.controls import (
        MasaCtrlAutoStep,
        MasaCtrlMaskStep,
    )

    b, h, n, d = 4, 2, 256, 16  # B = 2P, p = 2
    q, k, v = _qkv(jax.random.PRNGKey(11), b, h, n, d)
    site = AttnSite(layer=0, place="down", seq_len=n, is_cross=False)
    rng = np.random.RandomState(0)
    mask_s = jnp.asarray((rng.rand(16, 16) > 0.5).astype(np.float32))
    mask_t = jnp.asarray((rng.rand(16, 16) > 0.5).astype(np.float32))

    step = MasaCtrlMaskStep(
        step_gate=jnp.asarray(True), layers=(0,), num_prompts=2,
        mask_s=mask_s, mask_t=mask_t,
    )
    ref = step.self_override(site, q, k, v, None, use_flash=False)
    out = step.self_override(
        site, q, k, v, None, use_flash=False, cp_mesh=mesh
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # auto-masked variant with same-pass records
    auto = MasaCtrlAutoStep(
        step_gate=jnp.asarray(True), layers=(0,), num_prompts=2,
    )
    running = {
        "down_l0_cross": jax.random.uniform(jax.random.PRNGKey(12), (4, 256, 77))
    }
    ref_a = auto.self_override(site, q, k, v, running, use_flash=False)
    out_a = auto.self_override(
        site, q, k, v, running, use_flash=False, cp_mesh=mesh
    )
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(ref_a), atol=2e-5)


@pytest.mark.slow
def test_unet_masked_masactrl_with_cp_matches(mesh):
    """End-to-end: a CP-enabled UNet running the masked MasaCtrl control ==
    the plain UNet (the override used to bypass the mesh entirely)."""
    from image_editing_framework_tpu.core.config import MasaCtrlConfig
    from image_editing_framework_tpu.models import configs
    from image_editing_framework_tpu.models.unet import UNet2DCondition
    from image_editing_framework_tpu.ops.controls import build_masactrl_control

    base = UNet2DCondition(configs.TINY_UNET)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 4)) * 0.1
    ctx = jax.random.normal(jax.random.PRNGKey(1), (4, 77, 32))
    params = base.init(jax.random.PRNGKey(2), x, 10, ctx, None, None, False)
    rng = np.random.RandomState(1)
    ctrl = build_masactrl_control(
        4, configs.TINY_UNET.num_transformer_blocks,
        MasaCtrlConfig(start_step=0, start_layer=0),
        mask_s=(rng.rand(16, 16) > 0.5).astype(np.float32),
        mask_t=(rng.rand(16, 16) > 0.5).astype(np.float32),
    )
    step = ctrl.at_step(1)
    ref, _ = base.apply(params, x, 10, ctx, step, None, False)
    cp = UNet2DCondition(configs.TINY_UNET, cp_mesh=mesh, cp_min_seq=64)
    out, _ = cp.apply(params, x, 10, ctx, step, None, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_unet_with_context_parallel_matches(mesh):
    """UNet with ring-attention CP == plain UNet (8-dev mesh, low threshold)."""
    from image_editing_framework_tpu.models import configs
    from image_editing_framework_tpu.models.unet import UNet2DCondition

    base = UNet2DCondition(configs.TINY_UNET)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 32))
    params = base.init(jax.random.PRNGKey(2), x, 10, ctx, None, None, False)
    ref, _ = base.apply(params, x, 10, ctx, None, None, False)

    cp = UNet2DCondition(configs.TINY_UNET, cp_mesh=mesh, cp_min_seq=64)
    out, _ = cp.apply(params, x, 10, ctx, None, None, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # tiny UNet has 2 heads < 8 devices; use a 2-device mesh for Ulysses
    mesh2 = Mesh(np.array(jax.devices()[:2]), axis_names=("data",))
    uly = UNet2DCondition(
        configs.TINY_UNET, cp_mesh=mesh2, cp_min_seq=64, cp_mode="ulysses"
    )
    out_u, _ = uly.apply(params, x, 10, ctx, None, None, False)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(ref), atol=2e-5)
