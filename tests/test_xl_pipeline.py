"""SDXL-path end-to-end slices on the tiny XL pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_editing_framework_tpu.core.config import (
    MasaCtrlConfig,
    NTIConfig,
    P2PConfig,
    SamplerConfig,
)
from image_editing_framework_tpu.inversion.ddim import ddim_invert
from image_editing_framework_tpu.inversion.nti import null_text_inversion
from image_editing_framework_tpu.methods.base import denoise
from image_editing_framework_tpu.methods import common
from image_editing_framework_tpu.methods.masactrl import masactrl_edit
from image_editing_framework_tpu.methods.p2p import p2p_edit
from image_editing_framework_tpu.pipelines import tiny_pipeline

SAMPLER = SamplerConfig(height=128, width=128)


@pytest.fixture(scope="module")
def xl():
    return tiny_pipeline(num_steps=4, model_type="xl")


def test_xl_encode_prompts(xl):
    ctx, added = xl.encode_prompts(["a cat", "a dog"])
    assert ctx.shape == (4, 77, 32)
    assert added["text_embeds"].shape == (4, 16)
    # force-zeros uncond
    np.testing.assert_array_equal(np.asarray(ctx[:2]), 0)
    np.testing.assert_array_equal(np.asarray(added["text_embeds"][:2]), 0)


@pytest.mark.slow
def test_xl_sampling_and_inversion(xl):
    ctx, added = common.prepare_conditioning(xl, ["a cat"], 128, 128)
    lat0 = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4)) * 0.1
    final, _ = denoise(xl, lat0, ctx, guidance_scale=7.5, added_cond=added)
    assert bool(jnp.isfinite(final).all())

    last, traj, context, _ = ddim_invert(xl, lat0, "a cat")
    assert traj.shape == (5, 1, 16, 16, 4)
    # exact per-step inverse through the XL UNet (with added conds)
    from image_editing_framework_tpu.core.scheduler import ddim_step

    sched = xl.scheduler
    added1 = {
        "text_embeds": xl.encode_prompts(["a cat"])[1]["text_embeds"][1:],
        "time_ids": xl.add_time_ids(128, 128, 1),
    }
    for j in [0, 3]:
        t = sched.timesteps[sched.num_steps - 1 - j]
        eps, _ = xl.unet_apply(traj[j], t, context[1:], None, added1)
        back = ddim_step(sched, eps, sched.num_steps - 1 - j, traj[j + 1])
        np.testing.assert_allclose(np.asarray(back), np.asarray(traj[j]), atol=1e-4)


@pytest.mark.slow
def test_xl_nti_reset_variant(xl):
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4)) * 0.1
    last, traj, context, _ = ddim_invert(xl, lat, "a cat")
    added1 = {
        "text_embeds": xl.encode_prompts(["a cat"])[1]["text_embeds"][1:],
        "time_ids": xl.add_time_ids(128, 128, 1),
    }
    uncond_seq = null_text_inversion(
        xl, traj, context, NTIConfig(num_inner_steps=3, base_lr=5e-2),
        guidance_scale=7.5, added_cond=added1,
    )
    assert uncond_seq.shape == (4, 77, 32)
    assert bool(jnp.isfinite(uncond_seq).all())


def test_xl_nti_uses_negative_pooled_embeds(xl):
    """The XL NTI's uncond UNet evaluations run with the *negative* pooled
    embeds while the cond evaluation keeps the prompt's pooled embeds
    (masactrl/inversion/nti.py:58-59,75). ddim_invert's returned dict carries
    both halves; optimizing with the split must differ from (the old bug of)
    reusing the cond pooled embeds on both branches."""
    lat = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 16, 4)) * 0.1
    last, traj, context, added = ddim_invert(xl, lat, "a cat")
    assert "uncond_text_embeds" in added
    # tiny XL force-zeros the empty-prompt pooled embeds, so the halves differ
    assert float(np.abs(np.asarray(added["uncond_text_embeds"])).max()) == 0.0
    assert float(np.abs(np.asarray(added["text_embeds"])).max()) > 0.0
    cfg = NTIConfig(num_inner_steps=2, base_lr=5e-2)
    seq_split = null_text_inversion(
        xl, traj, context, cfg, guidance_scale=7.5, added_cond=added
    )
    both_cond = {"text_embeds": added["text_embeds"], "time_ids": added["time_ids"]}
    seq_cond_only = null_text_inversion(
        xl, traj, context, cfg, guidance_scale=7.5, added_cond=both_cond
    )
    assert bool(jnp.isfinite(seq_split).all())
    assert float(jnp.abs(seq_split - seq_cond_only).max()) > 0.0


def test_xl_cli_invert_null_text(xl):
    """The CLI inversion path must thread the XL added_cond into NTI
    (regression: cli.invert dropped ddim_invert's added_cond, so XL
    null-text inversion crashed on the UNet's added-cond assert)."""
    from image_editing_framework_tpu import cli

    img = np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8)
    last, traj, uncond_seq = cli.invert(
        xl, img, "a cat", "null-text", "masactrl", use_flash=False
    )
    assert uncond_seq.shape == (4, 77, 32)
    assert bool(jnp.isfinite(uncond_seq).all())


@pytest.mark.slow
def test_xl_p2p_edit(xl):
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 4))
    img = p2p_edit(
        xl, ["a cat sat", "a dog sat"], lat, P2PConfig(edit_type="replace"), SAMPLER
    )
    assert img.shape == (2, 32, 32, 3)


def test_xl_masactrl_edit(xl):
    lat = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 4))
    # tiny XL has 3 transformer blocks (1 down cross w/ 2 layers + ... )
    nblocks = xl.unet.config.num_transformer_blocks
    img = masactrl_edit(
        xl, ["a cat", "a standing cat"], lat,
        MasaCtrlConfig(start_step=1, start_layer=max(0, nblocks - 2)), SAMPLER,
    )
    assert img.shape == (2, 32, 32, 3)


@pytest.mark.slow
def test_xl_p2z_edit(xl):
    from image_editing_framework_tpu.core.config import P2ZConfig
    from image_editing_framework_tpu.methods.p2z import p2z_edit

    lat = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 4))
    rec, edit = p2z_edit(
        xl, ["a cat", "a dog"], lat, P2ZConfig(guidance_amount=0.05), SAMPLER
    )
    assert rec.shape == (1, 32, 32, 3) and edit.shape == (1, 32, 32, 3)


def test_img2img_refine(xl):
    from image_editing_framework_tpu.methods.img2img import img2img

    img = np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8)
    out = img2img(xl, img, "a cat", strength=0.5)
    assert out.shape == (1, 32, 32, 3)


@pytest.fixture(scope="module")
def refiner():
    return tiny_pipeline(num_steps=4, model_type="xl-refiner")


def test_refiner_encode_prompts(refiner):
    """Refiner encode: single tower, full-width context, non-zero uncond
    (force_zeros_for_empty_prompt=False, reference p2p/edit_real.py:80-88)."""
    assert refiner.is_refiner
    ctx, added = refiner.encode_prompts(["a cat"])
    # full cross_attention_dim from ONE tower (not a 2-tower concat)
    assert ctx.shape == (2, 77, 32)
    assert added["text_embeds"].shape == (2, 16)
    # uncond half is the encoded empty prompt — NOT zeros
    assert float(np.abs(np.asarray(ctx[0])).max()) > 0
    # and equals an explicit empty-prompt encode through the same tower
    ids = jnp.asarray(
        __import__(
            "image_editing_framework_tpu.models.tokenizer", fromlist=["pad_token_ids"]
        ).pad_token_ids(refiner.tokenizer, [""])
    )
    out = refiner.text_encoder_2.apply(refiner.text_params_2, ids)
    np.testing.assert_allclose(
        np.asarray(ctx[0]), np.asarray(out["penultimate"][0]), atol=1e-6
    )


def test_refiner_time_ids(refiner):
    """The refiner's (orig, crop, aesthetic_score) 5-id addition layout."""
    from image_editing_framework_tpu.methods.img2img import refiner_time_ids

    ids = refiner_time_ids(1024, 1024, 2, aesthetic_score=6.0)
    assert ids.shape == (2, 5)
    np.testing.assert_allclose(np.asarray(ids[0]), [1024, 1024, 0, 0, 6.0])
    # the pipeline emits the same layout when is_refiner
    np.testing.assert_allclose(
        np.asarray(refiner.add_time_ids(1024, 1024, 2, 6.0)), np.asarray(ids)
    )
    base = tiny_pipeline(num_steps=4, model_type="xl")
    assert base.add_time_ids(128, 128, 1).shape == (1, 6)


def test_img2img_through_refiner_pipe(refiner):
    """e2e img2img on the refiner flavor (5 time ids, single tower)."""
    from image_editing_framework_tpu.methods.img2img import img2img

    img = np.random.RandomState(3).randint(0, 255, (32, 32, 3), np.uint8)
    out = img2img(refiner, img, "a cat", strength=0.5)
    assert out.shape == (1, 32, 32, 3)
