"""Remat-twin UNet for gradient programs (methods/common.grad_unet).

XL-1024² gradient paths (p2z guided step `methods/p2z.py`, NTI inner Adam
`inversion/nti.py`) backprop through the full UNet; the saved transformer
activations OOM a 16 GB chip next to the resident bf16 params (measured:
RESOURCE_EXHAUSTED at xl-base p2z 1024², round 5). The fix is flax
``nn.remat`` on every BasicTransformerBlock — these tests pin that the twin
is bitwise-identical (fwd AND grad) and that the auto rule only fires at
XL >= 128-latent scale (the reference has no analogue: it spills to host
RAM via .cpu() caches, pix2pix-zero/model/sd_utils.py:104-110).
"""

import jax
import jax.numpy as jnp
import pytest

from image_editing_framework_tpu.methods.common import grad_unet
from image_editing_framework_tpu.ops.controls import P2ZStep
from image_editing_framework_tpu.pipelines import tiny_pipeline


@pytest.fixture(scope="module")
def pipe():
    return tiny_pipeline(num_steps=5)


def test_auto_rule(pipe):
    # SD never remats; XL only at latent side >= 128 (1024² pixels).
    assert grad_unet(pipe, 64) is pipe.unet
    assert grad_unet(pipe, 128) is pipe.unet
    xl = tiny_pipeline(num_steps=5, model_type="xl")
    assert grad_unet(xl, 64) is xl.unet
    assert grad_unet(xl, 128).remat is True
    # explicit override wins both ways
    assert grad_unet(pipe, 64, force=True).remat is True
    assert grad_unet(xl, 128, force=False) is xl.unet


def test_remat_twin_bitwise_identical(pipe):
    unet, unet_r = pipe.unet, grad_unet(pipe, 64, force=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    ctx = jax.random.normal(
        jax.random.PRNGKey(1), (2, 77, unet.config.cross_attention_dim)
    )

    def loss(u, x):
        # Differentiates through the recorded cross-attention maps exactly
        # like p2z's attn_loss, plus the eps output (NTI's path).
        eps, rec = u.apply(pipe.unet_params, x, 5, ctx, P2ZStep(), None, False)
        l = sum(jnp.square(v.astype(jnp.float32)).mean() for v in rec.values())
        return l + jnp.square(eps).mean()

    g0 = jax.grad(lambda x: loss(unet, x))(x)
    g1 = jax.grad(lambda x: loss(unet_r, x))(x)
    assert jnp.array_equal(g0, g1)
    o0, _ = unet.apply(pipe.unet_params, x, 5, ctx, None, None, False)
    o1, _ = unet_r.apply(pipe.unet_params, x, 5, ctx, None, None, False)
    assert jnp.array_equal(o0, o1)


def test_p2z_and_nti_accept_remat_override(pipe):
    """The full editors run under the remat twin at tiny scale (the same
    compiled path XL-1024 takes), producing finite outputs."""
    import numpy as np

    from image_editing_framework_tpu.core.config import (
        NTIConfig,
        P2ZConfig,
        SamplerConfig,
    )
    from image_editing_framework_tpu.inversion.ddim import ddim_invert
    from image_editing_framework_tpu.inversion.nti import null_text_inversion
    from image_editing_framework_tpu.methods.p2z import p2z_edit

    sampler = SamplerConfig(height=128, width=128, seed=0)
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
    rec, edit = p2z_edit(
        pipe, ["a cat", "a dog"], lat,
        P2ZConfig(remat_grad=True), sampler, use_flash=False,
    )
    assert np.isfinite(rec).all() and np.isfinite(edit).all()

    _, traj, ctx, added = ddim_invert(pipe, lat, "a cat", use_flash=False)
    uncond_seq = null_text_inversion(
        pipe, traj, ctx, NTIConfig(num_inner_steps=2, remat=True),
        added_cond=added, use_flash=False,
    )
    assert np.isfinite(uncond_seq).all()
