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


def default_masactrl_config(pipe) -> MasaCtrlConfig:
    """STEP=4, LAYPER=10 for SD / 54 for SDXL (masactrl/edit_real.py:48-49,
    :118), clamped to the model's transformer-block count so tiny test
    architectures still gate some layers. The single source of truth for
    the CLI, batched editors, service, and validation runway."""
    nblocks = pipe.unet.config.num_transformer_blocks
    start_layer = 54 if pipe.model_type == "xl" else 10
    if start_layer >= nblocks:
        start_layer = max(0, nblocks - 2)
    return MasaCtrlConfig(start_step=4, start_layer=start_layer)


def pca_direction(cond_embeddings: jnp.ndarray) -> jnp.ndarray:
    """Top principal direction of (emb[-2] - emb[-1]) over the token axis —
    the reference's ``kwds["dir"]`` feature (masactrl/model/sd_utils.py:56-59,
    torch.pca_lowrank(dir.T, q=1, center=True)). Returns (77,)."""
    d = cond_embeddings[-2] - cond_embeddings[-1]  # (77, D)
    a = d.T.astype(jnp.float32)  # (D, 77)
    a = a - a.mean(axis=0, keepdims=True)  # center columns
    _, _, vt = jnp.linalg.svd(a, full_matrices=False)
    return vt[0]


def masactrl_edit(
    pipe,
    prompts: Sequence[str],
    latent: jnp.ndarray,
    cfg: MasaCtrlConfig = MasaCtrlConfig(),
    sampler: SamplerConfig = SamplerConfig(),
    uncond_seq: Optional[jnp.ndarray] = None,
    source_replay: Optional[jnp.ndarray] = None,  # inversion trajectory
    direction_scale: Optional[float] = None,  # the reference's kwds["dir"]
    mask_s=None,
    mask_t=None,
    auto_mask: bool = False,
    thres: float = 0.1,
    ref_token_idx=(1,),
    cur_token_idx=(1,),
    neg_prompt: str = "",
    use_flash: bool = True,
) -> np.ndarray:
    p = len(prompts)
    s = pipe.scheduler.num_steps
    ctrl = build_masactrl_control(
        s, pipe.unet.config.num_transformer_blocks, cfg, num_prompts=p,
        mask_s=mask_s, mask_t=mask_t, auto_mask=auto_mask, thres=thres,
        ref_token_idx=tuple(ref_token_idx), cur_token_idx=tuple(cur_token_idx),
    )
    context, added_cond = common.prepare_conditioning(
        pipe, prompts, sampler.height, sampler.width, negative_prompt=neg_prompt
    )
    if direction_scale is not None:
        v = pca_direction(context[p:]).astype(context.dtype)
        context = context.at[-1].add(direction_scale * v[:, None])
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
