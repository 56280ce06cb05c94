"""End-to-end slices on the tiny random-weight pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_editing_framework_tpu.core.config import (
    MasaCtrlConfig,
    NTIConfig,
    P2PConfig,
    P2ZConfig,
    PnPConfig,
    SamplerConfig,
)
from image_editing_framework_tpu.core.scheduler import ddim_step
from image_editing_framework_tpu.inversion.ddim import ddim_invert
from image_editing_framework_tpu.inversion.nti import null_text_inversion
from image_editing_framework_tpu.methods.base import denoise
from image_editing_framework_tpu.methods.masactrl import masactrl_edit
from image_editing_framework_tpu.methods.p2p import p2p_edit
from image_editing_framework_tpu.methods.p2z import p2z_edit
from image_editing_framework_tpu.methods.pnp import pnp_edit
from image_editing_framework_tpu.pipelines import tiny_pipeline

SAMPLER = SamplerConfig(height=32, width=32)


@pytest.fixture(scope="module")
def pipe():
    return tiny_pipeline(num_steps=4)


@pytest.fixture(scope="module")
def pipe50():
    return tiny_pipeline(num_steps=50)


def test_text2image_sampling(pipe):
    ctx, _ = pipe.encode_prompts(["a cat"])
    lat0 = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
    final, ys = denoise(pipe, lat0, ctx, guidance_scale=7.5)
    assert final.shape == lat0.shape
    assert bool(jnp.isfinite(final).all())
    img = pipe.latent2image(final)
    assert img.shape == (1, 32, 32, 3) and img.dtype == np.uint8


def test_inversion_step_consistency(pipe):
    """Each inversion step must be the exact inverse of the denoising step
    evaluated with the same eps (validates timestep index plumbing)."""
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4)) * 0.1
    _, traj, context, _ = ddim_invert(pipe, lat, "a cat")
    sched = pipe.scheduler
    cond = context[1:]
    for j in range(sched.num_steps):
        t = sched.timesteps[sched.num_steps - 1 - j]
        eps, _ = pipe.unet_apply(traj[j], t, cond)
        back = ddim_step(sched, eps, sched.num_steps - 1 - j, traj[j + 1])
        np.testing.assert_allclose(
            np.asarray(back), np.asarray(traj[j]), atol=1e-4
        )


@pytest.mark.slow
def test_inversion_reconstruction(pipe50):
    """invert -> denoise at guidance 1.0 reconstructs far better than
    denoising from an unrelated start latent.

    (A random-weight UNet is not smooth like a trained one, so the classic
    DDIM-inversion identity is only approximate; with 50 steps the
    reconstruction is ~7x closer than a random start. The exact per-step
    inverse is covered by test_inversion_step_consistency.)"""
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 4)) * 0.1
    last, traj, context, _ = ddim_invert(pipe50, lat, "a cat")
    final, _ = denoise(pipe50, last, context, guidance_scale=1.0)
    err = float(jnp.abs(final - lat).mean())
    rand = jax.random.normal(jax.random.PRNGKey(99), last.shape) * float(jnp.std(last))
    final_rand, _ = denoise(pipe50, rand, context, guidance_scale=1.0)
    err_rand = float(jnp.abs(final_rand - lat).mean())
    assert err < err_rand / 3, (err, err_rand)


@pytest.mark.slow
def test_nti_improves_cfg_reconstruction(pipe):
    lat = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 4)) * 0.1
    last, traj, context, _ = ddim_invert(pipe, lat, "a cat")
    uncond_seq = null_text_inversion(
        pipe, traj, context, NTIConfig(num_inner_steps=5), guidance_scale=7.5
    )
    assert uncond_seq.shape == (4, 77, context.shape[-1])
    base, _ = denoise(pipe, last, context, guidance_scale=7.5)
    nti, _ = denoise(pipe, last, context, guidance_scale=7.5, uncond_seq=uncond_seq)
    err_base = float(jnp.abs(base - lat).mean())
    err_nti = float(jnp.abs(nti - lat).mean())
    assert err_nti < err_base, (err_nti, err_base)


@pytest.mark.slow
def test_nti_accepts_bf16_inputs(pipe):
    """Production SD pipelines run bf16; NTI's f32 CFG mix must not leak a
    dtype mismatch into the scan/while carries (regression: bf16 trajectory
    crashed _nti_scan with a carry-type error)."""
    lat = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 4)) * 0.1
    last, traj, context, _ = ddim_invert(pipe, lat, "a cat")
    uncond_seq = null_text_inversion(
        pipe,
        traj.astype(jnp.bfloat16),
        context.astype(jnp.bfloat16),
        NTIConfig(num_inner_steps=2),
        guidance_scale=7.5,
    )
    assert uncond_seq.dtype == jnp.float32
    assert uncond_seq.shape == (4, 77, context.shape[-1])
    assert bool(jnp.isfinite(uncond_seq).all())


def test_p2p_edit_runs(pipe50):
    lat = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 4))
    img = p2p_edit(
        pipe50, ["a cat sat", "a dog sat"], lat,
        P2PConfig(edit_type="replace"), SAMPLER,
    )
    assert img.shape == (2, 32, 32, 3)
    img = p2p_edit(
        pipe50, ["a cat sat", "a fluffy cat sat"], lat,
        P2PConfig(edit_type="refine"), SAMPLER,
    )
    assert img.shape == (2, 32, 32, 3)


def test_p2p_local_blend_runs(pipe50):
    lat = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 4))
    cfg = P2PConfig(edit_type="replace", blend_words=(("cat",), ("dog",)))
    img = p2p_edit(pipe50, ["a cat sat", "a dog sat"], lat, cfg, SAMPLER)
    assert img.shape == (2, 32, 32, 3)


def test_masactrl_edit_runs(pipe50):
    lat = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 16, 4))
    img = masactrl_edit(
        pipe50, ["a cat", "a standing cat"], lat,
        MasaCtrlConfig(start_step=4, start_layer=2), SAMPLER,
    )
    assert img.shape == (2, 32, 32, 3)


def test_pnp_edit_runs(pipe50):
    lat = jax.random.normal(jax.random.PRNGKey(6), (1, 16, 16, 4))
    # tiny config's up cross blocks are layers 2,3
    import image_editing_framework_tpu.methods.pnp as pnp_mod
    from image_editing_framework_tpu.ops.controls import build_pnp_control

    ctrl = build_pnp_control(50, PnPConfig(), (2, 3), ("up1_res0",))
    from image_editing_framework_tpu.methods import common
    from image_editing_framework_tpu.methods.base import denoise as dn

    ctx, _ = common.prepare_conditioning(pipe50, ["a cat", "a dog"], 32, 32)
    lat0 = common.expand_latent(lat, 2)
    final, _ = dn(pipe50, lat0, ctx, ctrl, guidance_scale=7.5)
    img = pipe50.latent2image(final)
    assert img.shape == (2, 32, 32, 3)


@pytest.mark.slow
def test_p2z_edit_runs_and_zero_guidance_equivalence(pipe):
    lat = jax.random.normal(jax.random.PRNGKey(7), (1, 16, 16, 4))
    rec, edit = p2z_edit(
        pipe, ["a cat", "a dog"], lat, P2ZConfig(guidance_amount=0.1), SAMPLER
    )
    assert rec.shape == (1, 32, 32, 3) and edit.shape == (1, 32, 32, 3)

    # guidance_amount=0 must equal a plain target-prompt denoise
    _, edit0 = p2z_edit(
        pipe, ["a cat", "a dog"], lat, P2ZConfig(guidance_amount=0.0), SAMPLER
    )
    ctx, _ = pipe.encode_prompts(["a dog"])
    plain, _ = denoise(pipe, lat, ctx, guidance_scale=7.5)
    plain_img = pipe.latent2image(plain)
    np.testing.assert_allclose(np.asarray(edit0), np.asarray(plain_img), atol=1)


def test_p2z_recompute_refs_matches_recorded(pipe):
    """recompute_refs rematerializes pass-1's maps from the latent
    trajectory — same refs (bf16-stored both ways), same edit, without the
    S x sites HBM residency."""
    lat = jax.random.normal(jax.random.PRNGKey(7), (1, 16, 16, 4))
    rec_a, edit_a = p2z_edit(
        pipe, ["a cat", "a dog"], lat, P2ZConfig(guidance_amount=0.1), SAMPLER
    )
    rec_b, edit_b = p2z_edit(
        pipe, ["a cat", "a dog"], lat,
        P2ZConfig(guidance_amount=0.1, recompute_refs=True), SAMPLER,
    )
    # pass 1 is bit-identical; pass 2 differs only by compiled-program
    # scheduling of the ref computation (uint8 pixels: allow 1 count)
    np.testing.assert_allclose(np.asarray(rec_a), np.asarray(rec_b), atol=1)
    np.testing.assert_allclose(np.asarray(edit_a), np.asarray(edit_b), atol=2)


@pytest.mark.slow
def test_direct_inversion_improves_cfg_reconstruction(pipe):
    """Source-branch trajectory replay (direct inversion) pins the
    reconstruction even under CFG 7.5."""
    lat = jax.random.normal(jax.random.PRNGKey(11), (1, 16, 16, 4)) * 0.1
    last, traj, context, _ = ddim_invert(pipe, lat, "a cat")
    ctx2, _ = pipe.encode_prompts(["a cat", "a cat"])
    from image_editing_framework_tpu.methods import common

    lat2 = common.expand_latent(last, 2)
    plain, _ = denoise(pipe, lat2, ctx2, guidance_scale=7.5)
    replay, _ = denoise(pipe, lat2, ctx2, guidance_scale=7.5, source_replay=traj)
    err_plain = float(jnp.abs(plain[0] - lat[0]).mean())
    err_replay = float(jnp.abs(replay[0] - lat[0]).mean())
    assert err_replay < err_plain, (err_replay, err_plain)


@pytest.mark.slow
def test_edit_determinism(pipe):
    """Same seed + inputs -> bitwise-identical edit outputs (no hidden
    nondeterminism in kernels or scan plumbing)."""
    lat = jax.random.normal(jax.random.PRNGKey(12), (1, 16, 16, 4))
    a = p2p_edit(pipe, ["a cat sat", "a dog sat"], lat,
                 P2PConfig(edit_type="replace"), SAMPLER)
    b = p2p_edit(pipe, ["a cat sat", "a dog sat"], lat,
                 P2PConfig(edit_type="replace"), SAMPLER)
    np.testing.assert_array_equal(a, b)
