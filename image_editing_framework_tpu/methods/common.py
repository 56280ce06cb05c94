"""Shared editor plumbing."""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp


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
