"""DDIM inversion as one jitted scan.

Matches the reference loop (p2p/inversion/ddim.py:21-32): S conditional-only
UNet evaluations walking timesteps in ascending order, collecting the full
latent trajectory (S+1 latents including the input).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from image_editing_framework_tpu.core.scheduler import (
    DDIMSchedule,
    ddim_reverse_step,
    inversion_timestep,
)


@functools.partial(jax.jit, static_argnames=("unet", "use_flash"))
def _invert_scan(
    unet,
    unet_params,
    sched: DDIMSchedule,
    latent: jnp.ndarray,  # (B, h, w, 4)
    cond_context: jnp.ndarray,  # (B, 77, D) conditional embeddings only
    added_cond,
    use_flash: bool,
):
    def step(lat, i):
        t = inversion_timestep(sched, i)
        eps, _ = unet.apply(unet_params, lat, t, cond_context, None, added_cond, use_flash)
        lat = ddim_reverse_step(sched, eps, i, lat)
        return lat, lat

    last, traj = jax.lax.scan(step, latent, jnp.arange(sched.num_steps))
    trajectory = jnp.concatenate([latent[None], traj], axis=0)  # (S+1, B, ...)
    return last, trajectory


def ddim_invert(
    pipe,
    latent: jnp.ndarray,
    prompt: str,
    use_flash: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Optional[Dict]]:
    """Invert a latent under a source prompt.

    Returns (final_noised_latent, trajectory (S+1,B,...), context (2,77,D),
    added_cond) — the context includes the uncond half for downstream NTI,
    mirroring the reference's get_context (p2p/inversion/ddim.py:43-57).
    ``added_cond`` is the batch-1 conditioning dict the inversion itself used
    (text_embeds + time_ids for XL, None for SD) so callers can hand it
    straight to null_text_inversion (the reference's NTI_XL added_cond_kwargs,
    masactrl/inversion/nti.py:55-66). For XL it also carries
    ``uncond_text_embeds`` (the negative pooled embeds) — NTI evaluates its
    uncond branch with those (masactrl/inversion/nti.py:59,75); the inversion
    scan itself is cond-only and ignores the extra key.
    """
    context, added = pipe.encode_prompts([prompt])
    cond = context[1:]  # (1, 77, D)
    added_cond = None
    if pipe.model_type == "xl":
        h, w = latent.shape[1] * 8, latent.shape[2] * 8
        added_cond = {
            "text_embeds": added["text_embeds"][1:],
            "time_ids": pipe.add_time_ids(h, w, 1),
        }
    last, traj = _invert_scan(
        pipe.unet, pipe.unet_params, pipe.scheduler, latent, cond, added_cond, use_flash
    )
    if added_cond is not None:
        added_cond = dict(added_cond, uncond_text_embeds=added["text_embeds"][:1])
    return last, traj, context, added_cond
