"""Plug-and-Play editor (spatial-feature + self-attention Q/K injection).

Reference: pnp/model/sd_utils.py (PnP.__call__ + NTI/XL variants); injection
semantics from pnp/model/register.py. Gates are per-step booleans; injection
is a batch-index remap at static site sets (attention) and the resnet hook
(conv features).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from image_editing_framework_tpu.core.config import PnPConfig, SamplerConfig
from image_editing_framework_tpu.methods import common
from image_editing_framework_tpu.methods.base import denoise
from image_editing_framework_tpu.models import configs as model_configs
from image_editing_framework_tpu.ops.controls import build_pnp_control


def pnp_edit(
    pipe,
    prompts: Sequence[str],  # [source_prompt, target_prompt]
    latent: jnp.ndarray,
    cfg: PnPConfig = PnPConfig(),
    sampler: SamplerConfig = SamplerConfig(),
    uncond_seq: Optional[jnp.ndarray] = None,
    source_replay: Optional[jnp.ndarray] = None,  # direct-inversion trajectory
    use_flash: bool = True,
) -> np.ndarray:
    assert len(prompts) == 2, "PnP edits one (source, target) prompt pair"
    s = pipe.scheduler.num_steps
    if pipe.model_type == "xl":
        attn_layers, conv_keys = model_configs.pnp_sites_xl(pipe.unet.config)
    else:
        attn_layers, conv_keys = model_configs.pnp_sites_sd(pipe.unet.config)
    ctrl = build_pnp_control(s, cfg, attn_layers, conv_keys)
    context, added_cond = common.prepare_conditioning(
        pipe, prompts, sampler.height, sampler.width
    )
    latents0 = common.expand_latent(latent, 2)
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
