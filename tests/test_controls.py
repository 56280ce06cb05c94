"""Controller semantics vs explicit reference math.

Each test re-derives the reference controller's behavior directly (einsum /
gather / softmax in NumPy-style jnp code, following the cited reference lines)
and checks the plan/edit machinery reproduces it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from image_editing_framework_tpu.core.config import MasaCtrlConfig, P2PConfig, PnPConfig
from image_editing_framework_tpu.ops import controls
from image_editing_framework_tpu.ops.attention import (
    AttnSite,
    cross_attention_probs,
    apply_probs,
    self_attention,
)
from tests.helpers import FakeTokenizer


def softmax_attn(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("hqd,hkd->hqk", q, k) / jnp.sqrt(d)
    p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(v.dtype)
    return jnp.einsum("hqk,hkd->hqd", p, v)


def rand_qkv(key, b, h, n, d):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (b, h, n, d), jnp.float32) for k in ks)


def test_masactrl_explicit_idx_lists():
    """step_idx/layer_idx lists override the start ranges (reference:
    MutualSelfAttentionControl(step_idx=..., layer_idx=...),
    masactrl/model/attention_control.py:16-29)."""
    ctrl = controls.build_masactrl_control(
        8, 4, MasaCtrlConfig(step_idx=(1, 3), layer_idx=(0, 2))
    )
    assert ctrl.layers == (0, 2)
    np.testing.assert_array_equal(
        np.asarray(ctrl.step_gate),
        [False, True, False, True, False, False, False, False],
    )
    # defaults unchanged: contiguous ranges from start_step/start_layer
    ctrl = controls.build_masactrl_control(8, 4, MasaCtrlConfig(start_step=2, start_layer=1))
    assert ctrl.layers == (1, 2, 3)
    assert not np.asarray(ctrl.step_gate)[:2].any()
    assert np.asarray(ctrl.step_gate)[2:].all()


def test_masactrl_mutual_plan():
    """Gated: every element of each CFG half attends to the half's source K/V
    (masactrl/model/attention_control.py:59-66)."""
    ctrl = controls.build_masactrl_control(
        50, 16, MasaCtrlConfig(start_step=4, start_layer=10), num_prompts=2
    )
    q, k, v = rand_qkv(jax.random.PRNGKey(0), 4, 2, 64, 16)
    site = AttnSite(layer=12, place="up", seq_len=64, is_cross=False)

    # gated step
    step = ctrl.at_step(10)
    out = self_attention(q, k, v, step.self_plan(site, 4), use_flash=False)
    for b in range(4):
        src = (b // 2) * 2
        expect = softmax_attn(q[b], k[src], v[src])
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(expect), atol=1e-5)

    # ungated step -> normal attention
    step = ctrl.at_step(0)
    out = self_attention(q, k, v, step.self_plan(site, 4), use_flash=False)
    for b in range(4):
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(softmax_attn(q[b], k[b], v[b])), atol=1e-5
        )

    # ungated layer
    site2 = AttnSite(layer=5, place="down", seq_len=64, is_cross=False)
    step = ctrl.at_step(10)
    out = self_attention(q, k, v, step.self_plan(site2, 4), use_flash=False)
    np.testing.assert_allclose(
        np.asarray(out[1]), np.asarray(softmax_attn(q[1], k[1], v[1])), atol=1e-5
    )


def test_masactrl_union_plan():
    """Union: targets attend concat([source, self]) K/V
    (masactrl/model/attention_control.py:102-103); source stays normal."""
    ctrl = controls.build_masactrl_control(
        50, 16, MasaCtrlConfig(start_step=4, start_layer=10, mode="union"),
        num_prompts=2,
    )
    q, k, v = rand_qkv(jax.random.PRNGKey(1), 4, 2, 64, 16)
    site = AttnSite(layer=12, place="up", seq_len=64, is_cross=False)
    step = ctrl.at_step(10)
    out = self_attention(q, k, v, step.self_plan(site, 4), use_flash=False)
    for b in [0, 2]:  # sources unchanged
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(softmax_attn(q[b], k[b], v[b])), atol=1e-5
        )
    for b in [1, 3]:  # targets use concat KV
        src = (b // 2) * 2
        kk = jnp.concatenate([k[src], k[b]], axis=1)
        vv = jnp.concatenate([v[src], v[b]], axis=1)
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(softmax_attn(q[b], kk, vv)), atol=1e-5
        )


def test_p2p_self_replace_plan():
    """Within the window, target self-attn probs are the source's, applied to
    the target's own V (p2p/model/attention_base.py:132-136) — only at
    <=16^2 tokens and only the conditional half."""
    tok = FakeTokenizer()
    ctrl = controls.build_p2p_control(
        ["a cat", "a dog"], tok, 50, P2PConfig(self_replace_steps=0.6), False
    )
    q, k, v = rand_qkv(jax.random.PRNGKey(2), 4, 2, 256, 16)
    site = AttnSite(layer=4, place="down", seq_len=256, is_cross=False)
    step = ctrl.at_step(10)  # inside window
    out = self_attention(q, k, v, step.self_plan(site, 4), use_flash=False)
    # uncond half + cond source: unchanged
    for b in [0, 1, 2]:
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(softmax_attn(q[b], k[b], v[b])), atol=1e-5
        )
    # cond target: source probs, own V
    np.testing.assert_allclose(
        np.asarray(out[3]), np.asarray(softmax_attn(q[2], k[2], v[3])), atol=1e-5
    )
    # outside window
    step = ctrl.at_step(40)
    out = self_attention(q, k, v, step.self_plan(site, 4), use_flash=False)
    np.testing.assert_allclose(
        np.asarray(out[3]), np.asarray(softmax_attn(q[3], k[3], v[3])), atol=1e-5
    )
    # large resolution -> no plan at all
    site_big = AttnSite(layer=0, place="down", seq_len=4096, is_cross=False)
    assert ctrl.at_step(10).self_plan(site_big, 4) is None


def test_p2p_cross_replace_matches_reference_einsum():
    """Replace edit: target probs = einsum('hpw,wn->hpn', base, mapper),
    window-blended (attention_control.py:16 + attention_base.py:118-121)."""
    tok = FakeTokenizer()
    prompts = ["a cat sat", "a dog sat"]
    ctrl = controls.build_p2p_control(
        prompts, tok, 50, P2PConfig(edit_type="replace", cross_replace_steps=0.8)
    )
    key = jax.random.PRNGKey(3)
    q, k, v = rand_qkv(key, 4, 2, 64, 16)
    k77 = jax.random.normal(key, (4, 2, 77, 16), jnp.float32)
    probs = cross_attention_probs(q, k77)
    site = AttnSite(layer=4, place="down", seq_len=64, is_cross=True)

    step = ctrl.at_step(5)  # alpha == 1 inside window
    edited = step.edit_cross(site, probs)
    # uncond half + source untouched
    np.testing.assert_allclose(np.asarray(edited[:3]), np.asarray(probs[:3]))
    mapper = np.asarray(ctrl.mapper[0])
    expect = np.einsum("hpw,wn->hpn", np.asarray(probs[2]), mapper)
    np.testing.assert_allclose(np.asarray(edited[3]), expect, atol=1e-6)

    step = ctrl.at_step(45)  # outside window: alpha == 0 -> unchanged
    edited = step.edit_cross(site, probs)
    np.testing.assert_allclose(np.asarray(edited[3]), np.asarray(probs[3]))


def test_p2p_cross_refine_matches_reference_gather():
    """Refine edit: gather + token-alpha blend (attention_control.py:28-31)."""
    tok = FakeTokenizer()
    prompts = ["a cat sat", "a fluffy cat sat"]
    ctrl = controls.build_p2p_control(
        prompts, tok, 50, P2PConfig(edit_type="refine", cross_replace_steps=0.8)
    )
    key = jax.random.PRNGKey(4)
    q, _, _ = rand_qkv(key, 4, 2, 64, 16)
    k77 = jax.random.normal(key, (4, 2, 77, 16), jnp.float32)
    probs = cross_attention_probs(q, k77)
    site = AttnSite(layer=4, place="down", seq_len=64, is_cross=True)
    step = ctrl.at_step(5)
    edited = step.edit_cross(site, probs)

    # reference: attn_base[:, :, mapper] * alphas + att_replace * (1 - alphas)
    from image_editing_framework_tpu.ops import seq_aligner

    gather, alphas = seq_aligner.get_refinement_mapper(prompts, tok)
    base = np.asarray(probs[2])
    tgt = np.asarray(probs[3])
    g = np.where(gather[0] >= 0, gather[0], 0)
    expect = base[:, :, g] * alphas[0] + tgt * (1 - alphas[0])
    np.testing.assert_allclose(np.asarray(edited[3]), expect, atol=1e-6)


def test_p2p_reweight_equalizer():
    tok = FakeTokenizer()
    prompts = ["a smiling cat", "a smiling cat"]
    cfg = P2PConfig(
        edit_type="refine", eq_words=("smiling",), eq_values=(3.0,),
        cross_replace_steps=0.8,
    )
    ctrl = controls.build_p2p_control(prompts, tok, 50, cfg)
    key = jax.random.PRNGKey(5)
    q, _, _ = rand_qkv(key, 4, 2, 64, 16)
    k77 = jax.random.normal(key, (4, 2, 77, 16), jnp.float32)
    probs = cross_attention_probs(q, k77)
    site = AttnSite(layer=4, place="down", seq_len=64, is_cross=True)
    edited = ctrl.at_step(5).edit_cross(site, probs)
    # identical prompts -> refine gather is identity and tok_alpha == 1, so
    # the edit takes the *source* probs; token 2 ("smiling") scaled x3.
    expect = np.asarray(probs[2]).copy()
    expect[:, :, 2] *= 3.0
    np.testing.assert_allclose(np.asarray(edited[3]), expect, atol=1e-6)


def test_pnp_plan_and_conv_hook():
    """Q/K of both target branches replaced by the conditional source's when
    gated (pnp/model/register.py:46-52); conv features likewise (:163-168)."""
    ctrl = controls.build_pnp_control(
        50, PnPConfig(pnp_attn_t=0.5, pnp_f_t=0.8),
        attn_layers=(8, 9), conv_keys=("up_r4",),
    )
    q, k, v = rand_qkv(jax.random.PRNGKey(6), 4, 2, 64, 16)
    site = AttnSite(layer=8, place="up", seq_len=64, is_cross=False)

    step = ctrl.at_step(10)  # gated (10 < 25)
    out = self_attention(q, k, v, step.self_plan(site, 4), use_flash=False)
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(softmax_attn(q[0], k[0], v[0])), atol=1e-5
    )
    for b in [1, 3]:
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(softmax_attn(q[2], k[2], v[b])), atol=1e-5
        )
    # conv hook
    h = jax.random.normal(jax.random.PRNGKey(7), (4, 8, 8, 16))
    hi = step.resnet_hook("up_r4", h)
    np.testing.assert_allclose(np.asarray(hi[1]), np.asarray(h[2]))
    np.testing.assert_allclose(np.asarray(hi[3]), np.asarray(h[2]))
    np.testing.assert_allclose(np.asarray(hi[0]), np.asarray(h[0]))
    assert np.allclose(np.asarray(step.resnet_hook("other", h)), np.asarray(h))

    step = ctrl.at_step(30)  # attn ungated (30 >= 25), conv still gated (< 40)
    out = self_attention(q, k, v, step.self_plan(site, 4), use_flash=False)
    np.testing.assert_allclose(
        np.asarray(out[1]), np.asarray(softmax_attn(q[1], k[1], v[1])), atol=1e-5
    )
    hi = step.resnet_hook("up_r4", h)
    np.testing.assert_allclose(np.asarray(hi[3]), np.asarray(h[2]))

    step = ctrl.at_step(45)  # both ungated
    hi = step.resnet_hook("up_r4", h)
    np.testing.assert_allclose(np.asarray(hi), np.asarray(h))

    # layer not in injection set
    site2 = AttnSite(layer=5, place="down", seq_len=64, is_cross=False)
    assert ctrl.at_step(10).self_plan(site2, 4) is None


def test_plans_through_flash_kernel():
    """The remap plans must behave identically through the fused kernel."""
    ctrl = controls.build_masactrl_control(
        50, 16, MasaCtrlConfig(start_step=4, start_layer=10), num_prompts=2
    )
    q, k, v = rand_qkv(jax.random.PRNGKey(8), 4, 2, 256, 64)
    site = AttnSite(layer=12, place="up", seq_len=256, is_cross=False)
    plan = ctrl.at_step(10).self_plan(site, 4)
    out_flash = self_attention(q, k, v, plan, use_flash=True)
    out_ref = self_attention(q, k, v, plan, use_flash=False)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_ref), atol=2e-5, rtol=2e-5
    )


def test_p2z_record_keys():
    ctrl = controls.P2ZControl()
    step = ctrl.at_step(0)
    cross = AttnSite(layer=3, place="down", seq_len=1024, is_cross=True)
    selfa = AttnSite(layer=3, place="down", seq_len=1024, is_cross=False)
    assert step.record_key(cross) == cross.key
    assert step.record_key(selfa) is None
    probs = jnp.ones((2, 8, 1024, 77), jnp.float32)
    rec = step.record(cross, probs)
    assert rec.dtype == jnp.bfloat16
