"""Auto-masked MasaCtrl (cross-attention-derived masks) through the scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_editing_framework_tpu.core.config import MasaCtrlConfig, SamplerConfig
from image_editing_framework_tpu.methods.masactrl import masactrl_edit
from image_editing_framework_tpu.ops import controls
from image_editing_framework_tpu.ops.attention import AttnSite
from image_editing_framework_tpu.pipelines import tiny_pipeline


def test_auto_step_same_pass_masks():
    """Masks derive from cross maps recorded EARLIER IN THE SAME FORWARD
    (the UNet's running records dict) — reference same-pass aggregation
    (masactrl/model/attention_control.py:273-296)."""
    ctrl = controls.build_masactrl_control(
        50, 16, MasaCtrlConfig(start_step=4, start_layer=10), auto_mask=True,
        ref_token_idx=(1,), cur_token_idx=(1,),
    )
    step = ctrl.at_step(10)
    assert isinstance(step, controls.MasaCtrlAutoStep)

    # recording: cross res16 sites only
    cross16 = AttnSite(layer=4, place="down", seq_len=256, is_cross=True)
    cross32 = AttnSite(layer=2, place="down", seq_len=1024, is_cross=True)
    assert step.record_key(cross16) == cross16.key
    assert step.record_key(cross32) is None
    probs = jax.random.uniform(jax.random.PRNGKey(0), (4, 8, 256, 77))
    rec = step.record(cross16, probs)
    assert rec.shape == (4, 256, 77)

    running = {"a": rec, "b": rec * 2.0}
    mask_s, mask_t = step._masks_from(running)
    assert mask_s.shape == (256,)
    assert float(mask_s.max()) == 1.0 and float(mask_s.min()) == 0.0

    # override produces output of the right shape and modifies only targets
    q, k, v = (
        jax.random.normal(kk, (4, 2, 256, 16))
        for kk in jax.random.split(jax.random.PRNGKey(1), 3)
    )
    site = AttnSite(layer=12, place="up", seq_len=256, is_cross=False)
    out = step.self_override(site, q, k, v, running)
    d = q.shape[-1]

    def attn(qb, kb, vb):
        # precision="highest": on TPU the default einsum precision would put
        # this oracle ~1e-2 from the f32 kernel path.
        s = jnp.einsum("hqd,hkd->hqk", qb, kb, precision="highest") / jnp.sqrt(d)
        p = jax.nn.softmax(s.astype(jnp.float32), -1)
        return jnp.einsum(
            "hqk,hkd->hqd", p.astype(vb.dtype), vb, precision="highest"
        )

    for b in [0, 2]:  # source rows: plain self-attention
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(attn(q[b], k[b], v[b])), atol=1e-5
        )
    assert float(jnp.abs(out[1] - attn(q[1], k[1], v[1])).max()) > 1e-4

    # empty running (no cross maps yet this forward): targets fall back to
    # PLAIN MUTUAL attention vs the source K/V (reference :293-296)
    out0 = step.self_override(site, q, k, v, {})
    np.testing.assert_allclose(
        np.asarray(out0[1]), np.asarray(attn(q[1], k[0], v[0])), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out0[0]), np.asarray(attn(q[0], k[0], v[0])), atol=1e-5
    )

    # ungated step: everything plain
    out_ungated = ctrl.at_step(0).self_override(site, q, k, v, running)
    for b in range(4):
        np.testing.assert_allclose(
            np.asarray(out_ungated[b]), np.asarray(attn(q[b], k[b], v[b])), atol=1e-5
        )


@pytest.mark.slow
def test_auto_mask_end_to_end():
    pipe = tiny_pipeline(num_steps=4)
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 4))
    img = masactrl_edit(
        pipe, ["a cat", "a standing cat"], lat,
        MasaCtrlConfig(start_step=1, start_layer=2),
        SamplerConfig(height=32, width=32),
        auto_mask=True,
    )
    assert img.shape == (2, 32, 32, 3)
