"""Batched multi-image editing: vmap over the per-image edit programs.

The reference's global-mutable-hook design forces batch-size-1 serial
processing of PIE-Bench (p2p/test.py:116, SURVEY.md §3.5). Here editors are
pure functions of (latent, context, control-pytree), so a group of images
runs as ONE program via ``jax.vmap`` — the denoising scan, CFG, controller
edits, and the P2P token mappers (batched as data, SURVEY.md §7 hard part 5)
all vectorize. Because "replace" and "refine" are both expressed as 77x77
matrices, mixed edit types batch together with no recompilation.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from image_editing_framework_tpu.core.config import P2PConfig
from image_editing_framework_tpu.core.scheduler import DDIMSchedule
from image_editing_framework_tpu.inversion.ddim import _invert_scan
from image_editing_framework_tpu.methods.base import LocalBlend, _denoise_scan
from image_editing_framework_tpu.ops import controls as ctl


def stack_controls(items: Sequence) -> object:
    """Stack per-image control pytrees (static fields must agree)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *items)


@functools.partial(jax.jit, static_argnames=("unet", "use_flash"))
def _batched_invert(unet, params, sched, latents, conds, added, use_flash):
    def one(lat, cond):
        return _invert_scan(unet, params, sched, lat, cond, added, use_flash)[0]

    return jax.vmap(one)(latents, conds)


@functools.partial(jax.jit, static_argnames=("unet", "use_flash"))
def _batched_edit(
    unet, params, sched, latents, contexts, ctrls, guidance, use_flash
):
    def one(lat, ctx, c):
        return _denoise_scan(
            unet, params, sched, lat, ctx, c, guidance, None, None,
            LocalBlend(jnp.zeros((1, 77))), None, use_flash, False, False, None,
        )[0]

    return jax.vmap(one)(latents, contexts, ctrls)


def p2p_edit_batch(
    pipe,
    prompt_pairs: Sequence[Sequence[str]],  # G pairs [source, target]
    latents: jnp.ndarray,  # (G, 1, h, w, 4)
    cfgs: Optional[Sequence[P2PConfig]] = None,
    guidance_scale: float = 7.5,
    use_flash: bool = True,
):
    """Edit G images in one compiled program. Returns (G, 2, H, W, 3) uint8."""
    g = len(prompt_pairs)
    s = pipe.scheduler.num_steps
    if cfgs is None:
        cfgs = [P2PConfig()] * g
    ctrls = stack_controls(
        [
            ctl.build_p2p_control(list(pair), pipe.tokenizer, s, cfg)
            for pair, cfg in zip(prompt_pairs, cfgs)
        ]
    )
    contexts = jnp.stack(
        [pipe.encode_prompts_sd(list(pair)) for pair in prompt_pairs]
    )  # (G, 4, 77, D)
    lat0 = jnp.broadcast_to(latents, (g, 2) + latents.shape[2:])
    final = _batched_edit(
        pipe.unet, pipe.unet_params, pipe.scheduler, lat0, contexts, ctrls,
        jnp.asarray(guidance_scale, latents.dtype), use_flash,
    )
    imgs = pipe.latent2image(final.reshape((g * 2,) + final.shape[2:]))
    return imgs.reshape((g, 2) + imgs.shape[1:])


def ddim_invert_batch(
    pipe,
    latents: jnp.ndarray,  # (G, 1, h, w, 4)
    prompts: Sequence[str],
    use_flash: bool = True,
) -> jnp.ndarray:
    """Invert G images under their source prompts in one program."""
    conds = jnp.stack([pipe.encode_prompts_sd([p])[1:] for p in prompts])
    return _batched_invert(
        pipe.unet, pipe.unet_params, pipe.scheduler, latents, conds, None,
        use_flash,
    )
