"""Prompt-to-Prompt editor.

Reference: p2p/model/sd_utils.py (P2P.text2image_ldm_stable + NTI/XL
variants), controllers from p2p/model/attention_control.py. All controller
state is precomputed into a P2PControl pytree; the denoising loop is one
jitted scan.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from image_editing_framework_tpu.core.config import P2PConfig, SamplerConfig
from image_editing_framework_tpu.methods import common
from image_editing_framework_tpu.methods.base import LocalBlend, denoise
from image_editing_framework_tpu.ops import schedules
from image_editing_framework_tpu.ops.controls import build_p2p_control


def p2p_edit(
    pipe,
    prompts: Sequence[str],
    latent: jnp.ndarray,  # (1, h, w, 4) — inverted or sampled start latent
    cfg: P2PConfig = P2PConfig(),
    sampler: SamplerConfig = SamplerConfig(),
    uncond_seq: Optional[jnp.ndarray] = None,  # (S, 77, D) NTI embeddings
    source_replay: Optional[jnp.ndarray] = None,  # direct-inversion trajectory
    use_flash: bool = True,
) -> np.ndarray:
    """Run a P2P edit; returns uint8 images (P, H, W, 3) where row 0 is the
    source-branch reconstruction (the reference's inversion.png)."""
    p = len(prompts)
    s = pipe.scheduler.num_steps
    blend = None
    record_blend = cfg.blend_words is not None
    if record_blend:
        alpha = schedules.blend_alpha_layers(prompts, cfg.blend_words, pipe.tokenizer)
        blend = LocalBlend(jnp.asarray(alpha), threshold=cfg.blend_threshold)
    ctrl = build_p2p_control(prompts, pipe.tokenizer, s, cfg, record_blend)
    context, added_cond = common.prepare_conditioning(
        pipe, prompts, sampler.height, sampler.width
    )
    latents0 = common.expand_latent(latent, p)
    final, _ = denoise(
        pipe,
        latents0,
        context,
        ctrl,
        guidance_scale=sampler.guidance_scale,
        added_cond=added_cond,
        uncond_seq=uncond_seq,
        blend=blend,
        source_replay=source_replay,
        use_flash=use_flash,
    )
    return pipe.latent2image(final)
