import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_editing_framework_tpu.core.config import MasaCtrlConfig, P2PConfig, PnPConfig
from image_editing_framework_tpu.models import configs
from image_editing_framework_tpu.models.clip import TINY_CLIP, CLIPTextModel
from image_editing_framework_tpu.models.unet import UNet2DCondition
from image_editing_framework_tpu.models.vae import TINY_VAE, AutoencoderKL
from image_editing_framework_tpu.ops import controls
from tests.helpers import FakeTokenizer


def tiny_unet(key=0, batch=4):
    m = UNet2DCondition(configs.TINY_UNET)
    x = jax.random.normal(jax.random.PRNGKey(key), (batch, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(key + 1), (batch, 77, 32))
    params = m.init(jax.random.PRNGKey(0), x, 10, ctx)
    return m, params, x, ctx


def test_unet_shapes_and_layout():
    m, params, x, ctx = tiny_unet()
    out, rec = m.apply(params, x, 10, ctx)
    assert out.shape == x.shape
    assert rec == {}
    assert configs.TINY_UNET.num_transformer_blocks == 4


@pytest.mark.slow
def test_p2z_records_all_cross_sites():
    m, params, x, ctx = tiny_unet(batch=2)
    ctrl = controls.P2ZControl().at_step(0)
    out, rec = m.apply(params, x, 10, ctx, ctrl)
    # tiny config: 1 down cross + 1 mid + 2 up cross transformer blocks
    assert len(rec) == 4
    for k, v in rec.items():
        assert "cross" in k
        assert v.dtype == jnp.bfloat16
        assert v.shape[0] == 2 and v.shape[-1] == 77


def test_masactrl_control_threading():
    """Ungated step == no control; gated step changes only target branches."""
    m, params, x, ctx = tiny_unet()
    ctrl = controls.build_masactrl_control(
        50, 4, MasaCtrlConfig(start_step=4, start_layer=0), num_prompts=2
    )
    base, _ = m.apply(params, x, 10, ctx)
    out_ungated, _ = m.apply(params, x, 10, ctx, ctrl.at_step(0))
    np.testing.assert_allclose(np.asarray(out_ungated), np.asarray(base), atol=1e-5)
    out_gated, _ = m.apply(params, x, 10, ctx, ctrl.at_step(10))
    # source branches (0 and 2) unchanged: they attend to themselves anyway
    np.testing.assert_allclose(np.asarray(out_gated[0]), np.asarray(base[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_gated[2]), np.asarray(base[2]), atol=1e-5)
    # target branches changed
    assert float(jnp.abs(out_gated[1] - base[1]).max()) > 1e-4
    assert float(jnp.abs(out_gated[3] - base[3]).max()) > 1e-4


def test_pnp_control_threading():
    m, params, x, ctx = tiny_unet()
    attn_layers = (2, 3)  # the up cross blocks in the tiny config
    ctrl = controls.build_pnp_control(
        50, PnPConfig(pnp_attn_t=0.5, pnp_f_t=0.8), attn_layers, ("up1_res0",)
    )
    base, _ = m.apply(params, x, 10, ctx)
    out, _ = m.apply(params, x, 10, ctx, ctrl.at_step(0))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(base[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(base[2]), atol=1e-5)
    assert float(jnp.abs(out[1] - base[1]).max()) > 1e-4
    assert float(jnp.abs(out[3] - base[3]).max()) > 1e-4
    out45, _ = m.apply(params, x, 10, ctx, ctrl.at_step(45))  # all gates off
    np.testing.assert_allclose(np.asarray(out45), np.asarray(base), atol=1e-5)


def test_p2p_identity_edit_is_noop():
    """With identical prompts the replace mapper is the identity, so editing
    identical src/tgt latents must reproduce the uncontrolled output."""
    tok = FakeTokenizer()
    m, params, x, ctx = tiny_unet()
    # make source and target identical in latents and context
    x = x.at[3].set(x[2]).at[1].set(x[0])
    ctx = ctx.at[3].set(ctx[2]).at[1].set(ctx[0])
    ctrl = controls.build_p2p_control(
        ["a cat", "a cat"], tok, 50, P2PConfig(edit_type="replace")
    )
    base, _ = m.apply(params, x, 10, ctx)
    out, _ = m.apply(params, x, 10, ctx, ctrl.at_step(10))
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-4)


def test_p2p_records_res16_sites():
    tok = FakeTokenizer()
    m, params, x, ctx = tiny_unet()
    ctrl = controls.build_p2p_control(
        ["a cat", "a dog"], tok, 50, P2PConfig(), record_blend=True
    )
    # tiny config: 16x16 input -> level0 seq 256 (down cross), up cross 256
    out, rec = m.apply(params, x, 10, ctx, ctrl.at_step(10))
    assert len(rec) == 3  # down tb0 + up tb2, tb3 at seq 256 (mid is 64)
    for v in rec.values():
        assert v.shape == (2, 256, 77)


def test_vae_roundtrip_shapes():
    vae = AutoencoderKL(TINY_VAE)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(1), x)
    z = vae.apply(params, x, method=AutoencoderKL.encode)
    assert z.shape == (1, 16, 16, 4)  # two levels -> /2
    img = vae.apply(params, z, method=AutoencoderKL.decode)
    assert img.shape == (1, 32, 32, 3)


def test_vae_tiled_decode():
    """Tiled decode: exact when one tile covers the latent; seam-blended and
    close to the full decode otherwise (memory-bounded XL decode path)."""
    import numpy as np

    from image_editing_framework_tpu.models.vae import decode_tiled

    vae = AutoencoderKL(TINY_VAE)
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 4)) * 0.5
    params = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    full = vae.apply(params, z, method=AutoencoderKL.decode)

    one_tile = decode_tiled(vae, params, z, tile=32)
    np.testing.assert_allclose(np.asarray(one_tile), np.asarray(full), atol=1e-6)

    tiled = decode_tiled(vae, params, z, tile=16, overlap=8)
    assert tiled.shape == full.shape
    assert bool(jnp.isfinite(tiled).all())
    # interiors agree; only border-padding effects differ near seams
    diff = np.abs(np.asarray(tiled, np.float32) - np.asarray(full, np.float32))
    assert np.median(diff) < 0.05, float(np.median(diff))


def test_clip_outputs():
    clip = CLIPTextModel(TINY_CLIP)
    ids = jnp.array([[1, 5, 6, 63, 0, 0, 0, 0]], jnp.int32)  # EOS=63 at pos 3
    params = clip.init(jax.random.PRNGKey(0), ids)
    out = clip.apply(params, ids)
    assert out["last_hidden_state"].shape == (1, 8, 32)
    assert out["penultimate"].shape == (1, 8, 32)
    assert out["pooled"].shape == (1, 32)


def test_clip_causality():
    """Changing a later token must not affect earlier positions."""
    clip = CLIPTextModel(TINY_CLIP)
    ids1 = jnp.array([[1, 5, 6, 7, 8, 9, 10, 63]], jnp.int32)
    ids2 = jnp.array([[1, 5, 6, 7, 40, 9, 10, 63]], jnp.int32)
    params = clip.init(jax.random.PRNGKey(0), ids1)
    h1 = clip.apply(params, ids1)["last_hidden_state"]
    h2 = clip.apply(params, ids2)["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(h1[:, :4]), np.asarray(h2[:, :4]), atol=1e-6)
    assert float(jnp.abs(h1[:, 4:] - h2[:, 4:]).max()) > 1e-4


@pytest.mark.slow
def test_remat_grads_match():
    """Rematerialized UNet: identical outputs and gradients."""
    from image_editing_framework_tpu.models.unet import UNet2DCondition as U

    m = U(configs.TINY_UNET)
    mr = U(configs.TINY_UNET, remat=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 32))
    params = m.init(jax.random.PRNGKey(2), x, 10, ctx)

    def loss(mod, p):
        out, _ = mod.apply(p, x, 10, ctx, None, None, False)
        return jnp.sum(out**2)

    l0, g0 = jax.value_and_grad(lambda p: loss(m, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(mr, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
