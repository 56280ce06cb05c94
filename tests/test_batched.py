"""Batched (vmapped) multi-image editing == per-image editing."""

import jax
import jax.numpy as jnp
import numpy as np

from image_editing_framework_tpu.core.config import P2PConfig, SamplerConfig
from image_editing_framework_tpu.eval.batched import (
    ddim_invert_batch,
    p2p_edit_batch,
)
from image_editing_framework_tpu.inversion.ddim import ddim_invert
from image_editing_framework_tpu.methods.p2p import p2p_edit
from image_editing_framework_tpu.pipelines import tiny_pipeline

SAMPLER = SamplerConfig(height=32, width=32)


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
