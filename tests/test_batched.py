"""Batched (vmapped) multi-image editing == per-image editing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_editing_framework_tpu.core.config import P2PConfig, SamplerConfig
from image_editing_framework_tpu.eval.batched import (
    ddim_invert_batch,
    p2p_edit_batch,
)
from image_editing_framework_tpu.inversion.ddim import ddim_invert
from image_editing_framework_tpu.methods.p2p import p2p_edit
from image_editing_framework_tpu.pipelines import tiny_pipeline

SAMPLER = SamplerConfig(height=32, width=32)


@pytest.mark.slow
def test_batched_p2p_matches_per_image():
    pipe = tiny_pipeline(num_steps=4)
    pairs = [
        ["a cat sat", "a dog sat"],          # replace (equal word counts)
        ["a cat sat", "a fluffy cat sat"],   # refine (mixed in same batch!)
    ]
    cfgs = [P2PConfig(edit_type="replace"), P2PConfig(edit_type="refine")]
    lats = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 16, 16, 4))

    batched = p2p_edit_batch(pipe, pairs, lats, cfgs)
    assert batched.shape == (2, 2, 32, 32, 3)

    for i, (pair, cfg) in enumerate(zip(pairs, cfgs)):
        single = p2p_edit(pipe, pair, lats[i], cfg, SAMPLER)
        np.testing.assert_allclose(
            batched[i].astype(np.int32), single.astype(np.int32), atol=1
        )


@pytest.mark.slow
def test_batched_masactrl_matches_per_image():
    from image_editing_framework_tpu.core.config import MasaCtrlConfig
    from image_editing_framework_tpu.eval.batched import masactrl_edit_batch
    from image_editing_framework_tpu.methods.masactrl import masactrl_edit

    pipe = tiny_pipeline(num_steps=4)
    cfg = MasaCtrlConfig(start_step=1, start_layer=0)
    pairs = [["a cat", "a standing cat"], ["a dog", "a running dog"]]
    lats = jax.random.normal(jax.random.PRNGKey(5), (2, 1, 16, 16, 4))
    batched = masactrl_edit_batch(pipe, pairs, lats, cfg)
    assert batched.shape == (2, 2, 32, 32, 3)
    for i, pair in enumerate(pairs):
        single = masactrl_edit(pipe, pair, lats[i], cfg, SAMPLER)
        np.testing.assert_allclose(
            batched[i].astype(np.int32), single.astype(np.int32), atol=1
        )


@pytest.mark.slow
def test_batched_pnp_matches_per_image():
    from image_editing_framework_tpu.core.config import PnPConfig
    from image_editing_framework_tpu.eval.batched import pnp_edit_batch
    from image_editing_framework_tpu.methods.pnp import pnp_edit

    pipe = tiny_pipeline(num_steps=4)
    cfg = PnPConfig(pnp_attn_t=0.5, pnp_f_t=0.8)
    pairs = [["a cat", "a dog"], ["a horse", "a zebra"]]
    lats = jax.random.normal(jax.random.PRNGKey(6), (2, 1, 16, 16, 4))
    batched = pnp_edit_batch(pipe, pairs, lats, cfg)
    assert batched.shape == (2, 2, 32, 32, 3)
    for i, pair in enumerate(pairs):
        single = pnp_edit(pipe, pair, lats[i], cfg, SAMPLER)
        np.testing.assert_allclose(
            batched[i].astype(np.int32), single.astype(np.int32), atol=1
        )


@pytest.mark.slow
def test_batched_p2z_matches_per_image():
    from image_editing_framework_tpu.core.config import P2ZConfig
    from image_editing_framework_tpu.eval.batched import p2z_edit_batch
    from image_editing_framework_tpu.methods.p2z import p2z_edit

    pipe = tiny_pipeline(num_steps=4)
    cfg = P2ZConfig(guidance_amount=0.05)
    pairs = [["a cat", "a dog"], ["a horse", "a zebra"]]
    lats = jax.random.normal(jax.random.PRNGKey(7), (2, 1, 16, 16, 4))
    batched = p2z_edit_batch(pipe, pairs, lats, cfg)
    assert batched.shape == (2, 2, 32, 32, 3)
    for i, pair in enumerate(pairs):
        rec, edit = p2z_edit(pipe, pair, lats[i], cfg, SAMPLER)
        np.testing.assert_allclose(
            batched[i, 0].astype(np.int32), rec[0].astype(np.int32), atol=1
        )
        np.testing.assert_allclose(
            batched[i, 1].astype(np.int32), edit[0].astype(np.int32), atol=1
        )
    # recompute_refs (the XL memory-discipline default) must agree with the
    # recorded-refs program on the same batch
    remat = p2z_edit_batch(
        pipe, pairs, lats,
        P2ZConfig(guidance_amount=0.05, recompute_refs=True),
    )
    np.testing.assert_allclose(
        remat.astype(np.int32), batched.astype(np.int32), atol=2
    )


@pytest.mark.slow
def test_batched_direct_inversion_matches_per_image():
    """Direct inversion (per-image trajectory replay) batches == serial."""
    pipe = tiny_pipeline(num_steps=4)
    pairs = [["a cat sat", "a dog sat"], ["a cat sat", "a fluffy cat sat"]]
    cfgs = [P2PConfig(edit_type="replace"), P2PConfig(edit_type="refine")]
    lats = jax.random.normal(jax.random.PRNGKey(9), (2, 1, 16, 16, 4)) * 0.1
    inverted, trajs = ddim_invert_batch(
        pipe, lats, [p[0] for p in pairs], return_trajectory=True
    )
    batched = p2p_edit_batch(pipe, pairs, inverted, cfgs, source_replays=trajs)
    assert batched.shape == (2, 2, 32, 32, 3)
    for i, (pair, cfg) in enumerate(zip(pairs, cfgs)):
        single_lat, straj, _, _ = ddim_invert(pipe, lats[i], pair[0])
        single = p2p_edit(
            pipe, pair, single_lat, cfg, SAMPLER, source_replay=straj
        )
        np.testing.assert_allclose(
            batched[i].astype(np.int32), single.astype(np.int32), atol=1
        )


@pytest.mark.slow
def test_batched_inversion_matches_per_image():
    pipe = tiny_pipeline(num_steps=4)
    lats = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 16, 16, 4)) * 0.1
    prompts = ["a cat", "a dog on a mat"]
    batched = ddim_invert_batch(pipe, lats, prompts)
    for i, p in enumerate(prompts):
        single, _, _, _ = ddim_invert(pipe, lats[i], p)
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single), atol=1e-5
        )


@pytest.mark.slow
def test_batched_nti_matches_per_image():
    from image_editing_framework_tpu.core.config import NTIConfig
    from image_editing_framework_tpu.eval.batched import ddim_invert_batch, nti_batch
    from image_editing_framework_tpu.inversion.nti import null_text_inversion

    pipe = tiny_pipeline(num_steps=4)
    lats = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 16, 16, 4)) * 0.1
    prompts = ["a cat", "a dog"]
    last, trajs = ddim_invert_batch(pipe, lats, prompts, return_trajectory=True)
    cfg = NTIConfig(num_inner_steps=3)
    batched = nti_batch(pipe, trajs, prompts, cfg)
    assert batched.shape == (2, 4, 77, 32)
    for i, p in enumerate(prompts):
        _, traj, ctx, _ = ddim_invert(pipe, lats[i], p)
        single = null_text_inversion(pipe, traj, ctx, cfg)
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single), atol=2e-4
        )


@pytest.mark.slow
def test_nti_group_serial_matches_per_image():
    """The sweep/serve batched path runs NTI serially per image (the vmapped
    variant loses the early stop); its per-image context/added_cond wiring
    must match the serial cli path exactly — SD and XL."""
    from image_editing_framework_tpu.core.config import NTIConfig
    from image_editing_framework_tpu.eval.batched import nti_group_serial
    from image_editing_framework_tpu.inversion.nti import null_text_inversion

    cfg = NTIConfig(num_inner_steps=2)
    for model_type, steps in (("sd", 4), ("xl", 3)):
        pipe = tiny_pipeline(
            num_steps=steps, **({"model_type": "xl"} if model_type == "xl" else {})
        )
        lats = jax.random.normal(jax.random.PRNGKey(9), (2, 1, 16, 16, 4)) * 0.1
        prompts = ["a cat", "a dog"]
        _, trajs = ddim_invert_batch(pipe, lats, prompts, return_trajectory=True)
        grouped = nti_group_serial(pipe, trajs, prompts, cfg)
        assert grouped.shape == (2, steps, 77, 32)
        for i, p in enumerate(prompts):
            _, traj, ctx, added = ddim_invert(pipe, lats[i], p)
            single = null_text_inversion(pipe, traj, ctx, cfg, added_cond=added)
            np.testing.assert_allclose(
                np.asarray(grouped[i]), np.asarray(single), atol=2e-4
            )


@pytest.mark.slow
def test_batched_edit_with_nti_seq():
    from image_editing_framework_tpu.core.config import P2PConfig

    pipe = tiny_pipeline(num_steps=4)
    pairs = [["a cat sat", "a dog sat"], ["a cat", "a fluffy cat"]]
    lats = jax.random.normal(jax.random.PRNGKey(3), (2, 1, 16, 16, 4))
    useqs = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 77, 32))
    cfgs = [P2PConfig(edit_type="replace"), P2PConfig(edit_type="refine")]
    batched = p2p_edit_batch(pipe, pairs, lats, cfgs, uncond_seqs=useqs)
    assert batched.shape == (2, 2, 32, 32, 3)
    single = p2p_edit(pipe, pairs[0], lats[0], cfgs[0], SAMPLER, uncond_seq=useqs[0])
    np.testing.assert_allclose(
        batched[0].astype(np.int32), single.astype(np.int32), atol=1
    )


@pytest.mark.slow
def test_batched_p2p_xl_matches_per_image():
    """XL batched editing: per-image added conds (text_embeds, time_ids)
    thread through the vmapped program and match the serial path exactly."""
    xl = tiny_pipeline(num_steps=3, model_type="xl")
    pairs = [["a cat sat", "a dog sat"], ["a tree", "a rock"]]
    lats = jax.random.normal(jax.random.PRNGKey(7), (2, 1, 16, 16, 4)) * 0.1
    batched = p2p_edit_batch(xl, pairs, lats)
    assert batched.shape == (2, 2, 32, 32, 3)
    sampler = SamplerConfig(height=128, width=128)
    for i, pair in enumerate(pairs):
        single = p2p_edit(xl, pair, lats[i], P2PConfig(), sampler)
        np.testing.assert_allclose(
            batched[i].astype(np.int32), single.astype(np.int32), atol=1
        )


@pytest.mark.slow
def test_batched_invert_nti_xl():
    from image_editing_framework_tpu.eval.batched import nti_batch

    xl = tiny_pipeline(num_steps=3, model_type="xl")
    lats = jax.random.normal(jax.random.PRNGKey(8), (2, 1, 16, 16, 4)) * 0.1
    prompts = ["a cat", "a dog"]
    last, traj = ddim_invert_batch(
        xl, lats, prompts, return_trajectory=True
    )
    assert traj.shape == (2, 4, 1, 16, 16, 4)
    # per-image parity with the serial inversion
    for i, p in enumerate(prompts):
        single, straj, _, _ = ddim_invert(xl, lats[i], p)
        np.testing.assert_allclose(
            np.asarray(traj[i]), np.asarray(straj), atol=1e-5
        )
    useq = nti_batch(
        xl, traj, prompts,
        cfg=__import__(
            "image_editing_framework_tpu.core.config", fromlist=["NTIConfig"]
        ).NTIConfig(num_inner_steps=2),
    )
    assert useq.shape == (2, 3, 77, 32)
    assert bool(jnp.isfinite(useq).all())
