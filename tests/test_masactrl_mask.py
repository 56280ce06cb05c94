"""Masked MasaCtrl variant semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_editing_framework_tpu.core.config import MasaCtrlConfig
from image_editing_framework_tpu.models import configs
from image_editing_framework_tpu.models.unet import UNet2DCondition
from image_editing_framework_tpu.ops import controls
from image_editing_framework_tpu.ops.attention import AttnSite
from image_editing_framework_tpu.ops.flash_attention import NEG_INF


def softmax_attn_bias(q, k, v, bias):
    # precision="highest": on TPU the default einsum precision is bf16-pass
    # matmul, which would put this oracle ~1e-2 away from the f32 kernel.
    d = q.shape[-1]
    s = jnp.einsum(
        "hqd,hkd->hqk", q, k, precision="highest"
    ) / jnp.sqrt(d) + bias[None, None, :]
    p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(v.dtype)
    return jnp.einsum("hqk,hkd->hqd", p, v, precision="highest")


def test_mask_step_semantics():
    n = 64
    side = 8
    mask = np.zeros((16, 16), np.float32)
    mask[:, :8] = 1.0  # left half = foreground
    ctrl = controls.build_masactrl_control(
        50, 16, MasaCtrlConfig(start_step=4, start_layer=10),
        mask_s=mask, mask_t=mask,
    )
    step = ctrl.at_step(10)
    assert isinstance(step, controls.MasaCtrlMaskStep)

    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(kk, (4, 2, n, 16)) for kk in jax.random.split(key, 3))
    site = AttnSite(layer=12, place="up", seq_len=n, is_cross=False)
    out = step.self_override(site, q, k, v)
    assert out is not None and out.shape == q.shape

    ms = np.asarray(
        jax.image.resize(jnp.asarray(mask), (side, side), "nearest")
    ).reshape(-1)
    bias_fg = jnp.where(jnp.asarray(ms) > 0.5, 0.0, NEG_INF)
    bias_bg = jnp.where(jnp.asarray(ms) > 0.5, NEG_INF, 0.0)
    for b in [1, 3]:  # targets
        src = (b // 2) * 2
        fg = softmax_attn_bias(q[b], k[src], v[src], bias_fg)
        bg = softmax_attn_bias(q[b], k[src], v[src], bias_bg)
        mt = jnp.asarray(ms)[None, :, None]
        expect = fg * mt + bg * (1 - mt)
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(expect), atol=1e-5)
    for b in [0, 2]:  # sources: plain self-attention
        d = q.shape[-1]
        s = jnp.einsum("hqd,hkd->hqk", q[b], k[b], precision="highest") / jnp.sqrt(d)
        p = jax.nn.softmax(s.astype(jnp.float32), -1)
        expect = jnp.einsum(
            "hqk,hkd->hqd", p.astype(v.dtype), v[b], precision="highest"
        )
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(expect), atol=1e-5)

    # ungated step: everything normal
    step0 = ctrl.at_step(0)
    out0 = step0.self_override(site, q, k, v)
    for b in range(4):
        d = q.shape[-1]
        s = jnp.einsum("hqd,hkd->hqk", q[b], k[b], precision="highest") / jnp.sqrt(d)
        p = jax.nn.softmax(s.astype(jnp.float32), -1)
        expect = jnp.einsum(
            "hqk,hkd->hqd", p.astype(v.dtype), v[b], precision="highest"
        )
        np.testing.assert_allclose(np.asarray(out0[b]), np.asarray(expect), atol=1e-5)

    # layer outside the static set: no override at all
    site2 = AttnSite(layer=3, place="down", seq_len=n, is_cross=False)
    assert step.self_override(site2, q, k, v) is None


@pytest.mark.slow
def test_mask_control_through_unet():
    m = UNet2DCondition(configs.TINY_UNET)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (4, 77, 32))
    params = m.init(jax.random.PRNGKey(2), x, 10, ctx)
    mask = np.zeros((16, 16), np.float32)
    mask[4:12, 4:12] = 1.0
    ctrl = controls.build_masactrl_control(
        50, 4, MasaCtrlConfig(start_step=4, start_layer=0),
        mask_s=mask, mask_t=mask,
    )
    # hold the attention algorithm fixed (use_flash=False on both sides):
    # mixing the kernel and the XLA path differs by matmul precision on TPU.
    base, _ = m.apply(params, x, 10, ctx, None, None, False)
    out, _ = m.apply(params, x, 10, ctx, ctrl.at_step(10), None, False)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(base[0]), atol=1e-5)
    assert float(jnp.abs(out[1] - base[1]).max()) > 1e-4
