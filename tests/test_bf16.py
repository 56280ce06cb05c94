"""Editors under bfloat16 — the production compute dtype.

Production pipelines load with dtype=bf16 (registry.load_pipeline), while
most tests run the tiny pipelines in f32, so dtype-promotion bugs hide (the
NTI bf16 carry crash shipped green). These lock in the bf16 path for every
editor family on the tiny pipeline fixture.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_editing_framework_tpu.core.config import (
    MasaCtrlConfig,
    P2PConfig,
    P2ZConfig,
    PnPConfig,
    SamplerConfig,
)
from image_editing_framework_tpu.methods.masactrl import masactrl_edit
from image_editing_framework_tpu.methods.p2p import p2p_edit
from image_editing_framework_tpu.methods.p2z import p2z_edit
from image_editing_framework_tpu.methods.pnp import pnp_edit
from image_editing_framework_tpu.pipelines import tiny_pipeline

SAMPLER = SamplerConfig()


@pytest.fixture(scope="module")
def bf16_pipe():
    return tiny_pipeline(num_steps=2, dtype=jnp.bfloat16)


@pytest.fixture(scope="module")
def lat():
    return (
        jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4), jnp.bfloat16)
        * 0.1
    )


def _check(img, p=2):
    assert img.shape == (p, 32, 32, 3) and img.dtype == np.uint8


def test_bf16_p2p(bf16_pipe, lat):
    _check(p2p_edit(bf16_pipe, ["a cat", "a dog"], lat, P2PConfig(), SAMPLER,
                    use_flash=False))


@pytest.mark.slow
def test_bf16_masactrl(bf16_pipe, lat):
    _check(masactrl_edit(
        bf16_pipe, ["a cat", "a dog"], lat,
        MasaCtrlConfig(start_step=1, start_layer=0), SAMPLER, use_flash=False,
    ))


@pytest.mark.slow
def test_bf16_pnp(bf16_pipe, lat):
    _check(pnp_edit(bf16_pipe, ["a cat", "a dog"], lat, PnPConfig(), SAMPLER,
                    use_flash=False))


@pytest.mark.slow
def test_bf16_p2z(bf16_pipe, lat):
    recon, edit = p2z_edit(
        bf16_pipe, ["a cat", "a dog"], lat, P2ZConfig(), SAMPLER,
        use_flash=False,
    )
    _check(recon, p=1)
    _check(edit, p=1)


@pytest.mark.slow
def test_bf16_batched_p2p(bf16_pipe):
    from image_editing_framework_tpu.eval.batched import edit_batch

    lats = (
        jax.random.normal(jax.random.PRNGKey(1), (2, 1, 16, 16, 4), jnp.bfloat16)
        * 0.1
    )
    out = edit_batch(
        "p2p", bf16_pipe, [("a cat", "a dog"), ("a tree", "a rock")], lats,
        use_flash=False,
    )
    assert len(out) == 2 and out[0].shape == (2, 32, 32, 3)


@pytest.mark.slow
def test_bf16_xl_p2p():
    xl = tiny_pipeline(num_steps=2, model_type="xl", dtype=jnp.bfloat16)
    lat0 = (
        jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 4), jnp.bfloat16)
        * 0.1
    )
    img = p2p_edit(
        xl, ["a cat", "a dog"], lat0, P2PConfig(),
        SamplerConfig(height=128, width=128), use_flash=False,
    )
    _check(img)
