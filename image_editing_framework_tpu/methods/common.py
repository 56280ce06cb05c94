"""Shared editor plumbing."""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp


def grad_unet(pipe, latent_side: int, force: Optional[bool] = None):
    """UNet module to differentiate through at this scale.

    Gradient programs (p2z's guided step, NTI's inner Adam loop) backprop
    through the full UNet; at XL 1024² (latent side 128) the saved
    transformer activations alone exceed a 16 GB chip next to the resident
    bf16 params, so the grad path uses a remat twin (``nn.remat`` on every
    BasicTransformerBlock — bitwise-identical outputs and gradients,
    ~O(depth) activation memory for ~30% extra backward FLOPs). Smaller
    programs keep the plain module: SD-512 NTI fits comfortably and remat
    would only slow it. ``force`` overrides the auto rule (tests, goldens).
    """
    remat = (
        force
        if force is not None
        else pipe.model_type == "xl" and latent_side >= 128
    )
    return pipe.unet.clone(remat=True) if remat else pipe.unet


def prepare_conditioning(
    pipe, prompts: Sequence[str], height: int, width: int,
    negative_prompt: str = "",
) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
    """Encode prompts and assemble the (2P, ...) added conditions for XL.

    ``negative_prompt`` replaces the empty unconditional (MasaCtrl's
    neg_prompt option, masactrl/model/sd_utils.py:73-77)."""
    context, added = pipe.encode_prompts(prompts, negative_prompt)
    added_cond = None
    if pipe.model_type == "xl":
        b = context.shape[0]
        added_cond = {
            "text_embeds": added["text_embeds"],
            "time_ids": pipe.add_time_ids(height, width, b),
        }
    return context, added_cond


def expand_latent(latent: jnp.ndarray, num_prompts: int) -> jnp.ndarray:
    """One latent shared by all prompt branches (reference init_latent,
    p2p/model/sd_utils.py:13-21 / torch.cat([latent, latent]))."""
    if latent.shape[0] == num_prompts:
        return latent
    assert latent.shape[0] == 1
    return jnp.broadcast_to(latent, (num_prompts,) + latent.shape[1:])
