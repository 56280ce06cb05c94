"""Primitive-level cross-framework semantics (Flax vs PyTorch)."""

import numpy as np
import pytest


def test_groupnorm_conv_upsample_match_torch():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from flax import linen as nn

    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 64).astype(np.float32)
    w = rng.randn(64).astype(np.float32)
    b = rng.randn(64).astype(np.float32)

    gn = nn.GroupNorm(num_groups=8, epsilon=1e-5)
    params = {"params": {"scale": jnp.asarray(w), "bias": jnp.asarray(b)}}
    out_flax = np.asarray(gn.apply(params, jnp.asarray(x)))
    tg = torch.nn.GroupNorm(8, 64, eps=1e-5)
    with torch.no_grad():
        tg.weight.copy_(torch.tensor(w))
        tg.bias.copy_(torch.tensor(b))
        out_torch = tg(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out_flax, out_torch, atol=1e-5)

    cw = rng.randn(16, 64, 3, 3).astype(np.float32)
    conv = nn.Conv(16, (3, 3), strides=(2, 2), padding=1)
    cp = {"params": {"kernel": jnp.asarray(cw.transpose(2, 3, 1, 0)), "bias": jnp.zeros(16)}}
    of = np.asarray(conv.apply(cp, jnp.asarray(x)))
    ot = torch.nn.functional.conv2d(
        torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(cw), stride=2, padding=1
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(of, ot, atol=1e-4)

    up_t = torch.nn.functional.interpolate(
        torch.tensor(x.transpose(0, 3, 1, 2)), scale_factor=2, mode="nearest"
    ).numpy().transpose(0, 2, 3, 1)
    up_f = np.asarray(jnp.repeat(jnp.repeat(jnp.asarray(x), 2, axis=1), 2, axis=2))
    np.testing.assert_array_equal(up_t, up_f)
