"""Pure-function DDIM scheduler.

The reference configures a diffusers ``DDIMScheduler`` with
``beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
num_train_timesteps=1000, steps_offset=1, clip_sample=False,
set_alpha_to_one=False`` (reference: p2p/edit_real.py:58-69) and uses

* ``scheduler.step``            for denoising   (p2p/model/sd_utils.py:76)
* a closed-form reverse step    for inversion   (p2p/inversion/ddim.py:9-18)

Here the scheduler is a small immutable pytree of precomputed tables plus
pure step functions, so the whole 50-step loop jits into one ``lax.scan``.
All indexing is by *step index* (0..S-1), never by a traced Python int
timestep, keeping shapes static under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DDIMSchedule:
    """Immutable DDIM schedule tables.

    Attributes:
      alphas_cumprod: (num_train_timesteps,) float32 cumulative alpha products.
      final_alpha_cumprod: scalar; ``alphas_cumprod[0]`` (set_alpha_to_one=False).
      timesteps: (num_steps,) int32, descending (e.g. [981, 961, ..., 21, 1]
        for 50 steps with steps_offset=1).
      num_train_timesteps: static total diffusion steps (1000).
      num_steps: static number of inference steps.
    """

    alphas_cumprod: jnp.ndarray
    final_alpha_cumprod: jnp.ndarray
    timesteps: jnp.ndarray
    num_train_timesteps: int = struct.field(pytree_node=False)
    num_steps: int = struct.field(pytree_node=False)

    @property
    def step_ratio(self) -> int:
        return self.num_train_timesteps // self.num_steps


def make_ddim_schedule(
    num_steps: int,
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    steps_offset: int = 1,
    set_alpha_to_one: bool = False,
    dtype=jnp.float32,
) -> DDIMSchedule:
    """Build the DDIM schedule matching the reference's scheduler config."""
    # Tables are built host-side in float64 (jit never sees this code path).
    import numpy as np

    if beta_schedule == "scaled_linear":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
            ** 2
        )
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    else:
        raise ValueError(f"unsupported beta_schedule: {beta_schedule}")
    alphas_cumprod = jnp.asarray(np.cumprod(1.0 - betas), dtype)
    final_alpha_cumprod = (
        jnp.asarray(1.0, dtype) if set_alpha_to_one else alphas_cumprod[0]
    )
    step_ratio = num_train_timesteps // num_steps
    # diffusers "leading" spacing with steps_offset: [0, r, 2r, ...] reversed + offset.
    timesteps = (
        jnp.arange(0, num_steps, dtype=jnp.int32)[::-1] * step_ratio + steps_offset
    )
    return DDIMSchedule(
        alphas_cumprod=alphas_cumprod,
        final_alpha_cumprod=final_alpha_cumprod,
        timesteps=timesteps,
        num_train_timesteps=num_train_timesteps,
        num_steps=num_steps,
    )


def _broadcast(a: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    return a.reshape((-1,) + (1,) * (like.ndim - 1)) if a.ndim else a


def ddim_step(
    sched: DDIMSchedule, eps: jnp.ndarray, step_index: jnp.ndarray, sample: jnp.ndarray
) -> jnp.ndarray:
    """One deterministic (eta=0) DDIM denoising step x_t -> x_{t-Δ}.

    ``step_index`` indexes ``sched.timesteps`` (0 = most-noised). Matches
    diffusers DDIMScheduler.step with prediction_type="epsilon",
    clip_sample=False, eta=0 (reference call site: p2p/model/sd_utils.py:76).
    """
    t = sched.timesteps[step_index]
    prev_t = t - sched.step_ratio
    acp = sched.alphas_cumprod
    alpha_t = acp[t]
    alpha_prev = jnp.where(
        prev_t >= 0, acp[jnp.clip(prev_t, 0)], sched.final_alpha_cumprod
    )
    alpha_t = alpha_t.astype(sample.dtype)
    alpha_prev = alpha_prev.astype(sample.dtype)
    pred_x0 = (sample - jnp.sqrt(1.0 - alpha_t) * eps) / jnp.sqrt(alpha_t)
    return jnp.sqrt(alpha_prev) * pred_x0 + jnp.sqrt(1.0 - alpha_prev) * eps


def ddim_reverse_step(
    sched: DDIMSchedule, eps: jnp.ndarray, step_index: jnp.ndarray, sample: jnp.ndarray
) -> jnp.ndarray:
    """One deterministic DDIM *inversion* step x_{t-Δ} -> x_t.

    Mirrors the reference's closed-form reverse step
    (p2p/inversion/ddim.py:9-18): when inverting toward timestep
    ``t_next = timesteps[S-1-i]``, the UNet is evaluated at ``t_next`` on the
    current sample, and the source timestep is ``t_next - step_ratio``
    (clamped to final_alpha_cumprod when negative).

    ``step_index`` here counts inversion iterations i = 0..S-1, so the target
    timestep is ``sched.timesteps[S - 1 - i]`` (ascending order).
    """
    t_next = sched.timesteps[sched.num_steps - 1 - step_index]
    t_src = t_next - sched.step_ratio
    acp = sched.alphas_cumprod
    alpha_src = jnp.where(
        t_src >= 0, acp[jnp.clip(t_src, 0)], sched.final_alpha_cumprod
    ).astype(sample.dtype)
    alpha_next = acp[t_next].astype(sample.dtype)
    pred_x0 = (sample - jnp.sqrt(1.0 - alpha_src) * eps) / jnp.sqrt(alpha_src)
    return jnp.sqrt(alpha_next) * pred_x0 + jnp.sqrt(1.0 - alpha_next) * eps


def inversion_timestep(sched: DDIMSchedule, step_index: jnp.ndarray) -> jnp.ndarray:
    """Timestep fed to the UNet at inversion iteration ``step_index``."""
    return sched.timesteps[sched.num_steps - 1 - step_index]


def add_noise(
    sched: DDIMSchedule, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Forward diffusion q(x_t | x_0)."""
    alpha = sched.alphas_cumprod[t].astype(x0.dtype)
    return jnp.sqrt(alpha) * x0 + jnp.sqrt(1.0 - alpha) * noise


def scale_model_input(sample: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """DDIM needs no input scaling; provided for API parity
    (reference: pnp/model/sd_utils.py:94 calls scheduler.scale_model_input)."""
    del t
    return sample
