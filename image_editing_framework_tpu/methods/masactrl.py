"""MasaCtrl editor (mutual self-attention K/V sharing).

Reference: masactrl/model/sd_utils.py (MasaCtrl.__call__ + NTI/XL variants),
controllers from masactrl/model/attention_control.py. The step/layer gate is
a precomputed table; the K/V swap runs inside the fused flash kernel.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from image_editing_framework_tpu.core.config import MasaCtrlConfig, SamplerConfig
from image_editing_framework_tpu.methods import common
from image_editing_framework_tpu.methods.base import denoise
from image_editing_framework_tpu.ops.controls import build_masactrl_control


def masactrl_edit(
    pipe,
    prompts: Sequence[str],
    latent: jnp.ndarray,
    cfg: MasaCtrlConfig = MasaCtrlConfig(),
    sampler: SamplerConfig = SamplerConfig(),
    uncond_seq: Optional[jnp.ndarray] = None,
    source_replay: Optional[jnp.ndarray] = None,  # inversion trajectory
    use_flash: bool = True,
) -> np.ndarray:
    p = len(prompts)
    s = pipe.scheduler.num_steps
    ctrl = build_masactrl_control(
        s, pipe.unet.config.num_transformer_blocks, cfg, num_prompts=p
    )
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
        source_replay=source_replay,
        use_flash=use_flash,
    )
    return pipe.latent2image(final)
