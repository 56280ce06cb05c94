import jax.numpy as jnp
import numpy as np

from image_editing_framework_tpu.core.scheduler import (
    make_ddim_schedule,
    ddim_step,
    ddim_reverse_step,
    inversion_timestep,
    add_noise,
)


def test_timesteps_match_reference_config():
    # steps_offset=1, 1000 train steps, 50 inference steps -> [981, ..., 21, 1]
    s = make_ddim_schedule(50)
    ts = np.asarray(s.timesteps)
    assert ts[0] == 981 and ts[-1] == 1
    assert np.all(np.diff(ts) == -20)
    assert s.step_ratio == 20


def test_alphas_cumprod_golden():
    s = make_ddim_schedule(50)
    # Independent recomputation in float64 numpy.
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    acp = np.cumprod(1.0 - betas)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod), acp, rtol=1e-5)
    # set_alpha_to_one=False -> final = alphas_cumprod[0]
    assert float(s.final_alpha_cumprod) == float(s.alphas_cumprod[0])


def test_step_reverse_roundtrip_exact():
    """With identical eps, ddim_reverse_step and ddim_step are exact inverses."""
    s = make_ddim_schedule(50)
    x = jnp.array(np.random.RandomState(0).randn(1, 8, 8, 4), jnp.float32)
    eps = jnp.array(np.random.RandomState(1).randn(1, 8, 8, 4), jnp.float32)
    for i in [0, 10, 49]:
        # inversion iteration i maps timesteps[S-1-i]-20 -> timesteps[S-1-i]
        x_up = ddim_reverse_step(s, eps, i, x)
        # denoising step with step_index = S-1-i maps back down
        x_back = ddim_step(s, eps, s.num_steps - 1 - i, x_up)
        np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-4)


def test_inversion_timestep_order():
    s = make_ddim_schedule(50)
    assert int(inversion_timestep(s, 0)) == 1
    assert int(inversion_timestep(s, 49)) == 981


def test_ddim_step_manual_value():
    """Check one denoising step against a hand-rolled computation."""
    s = make_ddim_schedule(50)
    x = jnp.ones((1, 2, 2, 4), jnp.float32) * 0.5
    eps = jnp.ones((1, 2, 2, 4), jnp.float32) * 0.1
    out = ddim_step(s, eps, 0, x)  # t=981 -> 961
    acp = np.asarray(s.alphas_cumprod)
    a_t, a_prev = acp[981], acp[961]
    x0 = (0.5 - np.sqrt(1 - a_t) * 0.1) / np.sqrt(a_t)
    expect = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * 0.1
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)


def test_final_step_uses_final_alpha():
    """Last denoising step (t=1) has prev_t=-19 -> final_alpha_cumprod."""
    s = make_ddim_schedule(50)
    x = jnp.ones((1, 2, 2, 4), jnp.float32)
    eps = jnp.zeros((1, 2, 2, 4), jnp.float32)
    out = ddim_step(s, eps, 49, x)
    acp = np.asarray(s.alphas_cumprod)
    expect = np.sqrt(acp[0]) * (1.0 / np.sqrt(acp[1]))
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)


def test_add_noise():
    s = make_ddim_schedule(50)
    x0 = jnp.ones((1, 2, 2, 4), jnp.float32)
    noise = jnp.ones((1, 2, 2, 4), jnp.float32)
    t = jnp.asarray(500)
    out = add_noise(s, x0, noise, t)
    a = float(s.alphas_cumprod[500])
    np.testing.assert_allclose(
        np.asarray(out), np.sqrt(a) + np.sqrt(1 - a), rtol=1e-5
    )
