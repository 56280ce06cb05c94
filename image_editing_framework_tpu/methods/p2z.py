"""pix2pix-zero editor (cross-attention-map guidance).

Reference: pix2pix-zero/model/sd_utils.py (P2P_Zero.__call__). Two passes:

1. Denoise with the *source* prompt, recording every cross-attention
   probability map per step (reference caches them to host RAM,
   sd_utils.py:104-110; here they stay HBM-resident as scan ys in bfloat16).
2. Re-denoise from the initial latent with the *target* prompt; each step
   takes one SGD step on the CFG-doubled latent input minimizing the L2
   distance of current cross-attention maps to the recorded ones
   (sd_utils.py:157-174), then recomputes the noise on the updated input.

The inner gradient is ``jax.grad`` through the UNet's explicit float32
cross-attention probabilities — no hook machinery, no host transfer.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from image_editing_framework_tpu.core.config import P2ZConfig, SamplerConfig
from image_editing_framework_tpu.core.scheduler import DDIMSchedule, ddim_step
from image_editing_framework_tpu.methods import common
from image_editing_framework_tpu.methods.base import denoise
from image_editing_framework_tpu.ops.controls import P2ZControl, P2ZStep


@functools.partial(
    jax.jit,
    static_argnames=("unet", "use_flash"),
    # refs (50 steps x every cross site, ~6 GB at XL scale) are consumed
    # only by this program: donating them lets XLA reuse/free the buffers
    # inside the pass instead of waiting for Python refcount + the
    # tunnel's deferred deletes — without this, the refs overlap the
    # final VAE decode's transients and OOM a 16 GB chip at XL 512².
    donate_argnames=("refs",),
)
def _guided_scan(
    unet,
    unet_params,
    sched: DDIMSchedule,
    latents0: jnp.ndarray,  # (1, h, w, 4)
    context: jnp.ndarray,  # (2, 77, D) [uncond, cond(target)]
    refs: Optional[Dict[str, jnp.ndarray]],  # per-site (S, 2, H, N, 77) maps
    guidance_scale,
    guidance_amount,
    added_cond,
    uncond_seq,  # (S, 77, D) per-step NTI embeddings or None
    use_flash: bool,
    # recompute_refs mode (refs is None): rematerialize the reference maps
    # each step from the stored source-pass latent trajectory instead of
    # holding every recorded map in HBM. Trades one extra (CFG-doubled)
    # source UNet forward per step for ~6 GB of resident XL maps — the
    # jax.checkpoint idea applied across the two p2z passes.
    src_traj=None,  # (S, 1, h, w, 4) pass-1 UNet-input latents
    ctx_src=None,  # (2, 77, D) source-prompt context
    added_src=None,
):
    step_ctrl = P2ZStep()

    def make_context(i, ctx):
        if uncond_seq is None:
            return ctx
        # NTI variant swaps the optimized uncond in per step
        # (pix2pix-zero/model/sd_utils.py P2P_Zero_NTI:518,582).
        return jnp.concatenate(
            [uncond_seq[i][None].astype(ctx.dtype), ctx[1:]], axis=0
        )

    def attn_loss(x_in, t, ctx, ref_t):
        _, rec = unet.apply(
            unet_params, x_in, t, ctx, step_ctrl, added_cond, use_flash
        )
        # reference: sum((curr - ref)^2 over (N, 77)), mean over batch*heads
        # (pix2pix-zero/model/sd_utils.py:166-172).
        loss = 0.0
        for k, cur in rec.items():
            d = cur.astype(jnp.float32) - ref_t[k].astype(jnp.float32)
            loss += jnp.square(d).sum(axis=(2, 3)).mean()
        return loss

    grad_fn = jax.grad(attn_loss)

    def step_fn(lat, i):
        t = sched.timesteps[i]
        ctx = make_context(i, context)
        if refs is not None:
            ref_t = {k: v[i] for k, v in refs.items()}
        else:
            # Re-run pass 1's step-i forward (identical inputs: stored
            # latent, source context incl. the NTI swap) and record the
            # same bf16 maps P2ZStep stored in the recorded path.
            src_in = jnp.concatenate([src_traj[i]] * 2, axis=0)
            _, ref_t = unet.apply(
                unet_params, src_in, t, make_context(i, ctx_src), step_ctrl,
                added_src, use_flash,
            )
            ref_t = jax.lax.stop_gradient(ref_t)
        x_in = jnp.concatenate([lat] * 2, axis=0)
        g = grad_fn(x_in, t, ctx, ref_t)
        x_in = x_in - guidance_amount * g  # SGD step (lr = guidance_amount)
        eps, _ = unet.apply(unet_params, x_in, t, ctx, None, added_cond, use_flash)
        # reference: latents = x_in.chunk(2)[0] (sd_utils.py:180)
        lat = x_in[:1]
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        eps_g = eps_u + guidance_scale * (eps_c - eps_u)
        return ddim_step(sched, eps_g, i, lat), None

    lat, _ = jax.lax.scan(step_fn, latents0, jnp.arange(sched.num_steps))
    return lat


def p2z_edit(
    pipe,
    prompts: Sequence[str],  # [source_prompt, target_prompt]
    latent: jnp.ndarray,  # (1, h, w, 4) initial latent
    cfg: P2ZConfig = P2ZConfig(),
    sampler: SamplerConfig = SamplerConfig(),
    edit_dir: Optional[jnp.ndarray] = None,
    uncond_seq: Optional[jnp.ndarray] = None,
    only_sample: bool = False,
    use_flash: bool = True,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Returns (reconstruction_image, edited_image)."""
    assert len(prompts) == 2
    # ---- pass 1: source prompt, record reference cross-attention maps —
    # or, in recompute_refs mode, only the ~2 MB latent trajectory from
    # which pass 2 rematerializes them (XL-scale HBM discipline).
    ctx_src, added_src = common.prepare_conditioning(
        pipe, [prompts[0]], sampler.height, sampler.width
    )
    refs = src_traj = None
    if cfg.recompute_refs:
        final_src, _, src_traj = denoise(
            pipe,
            latent,
            ctx_src,
            None,  # no recording — refs are rematerialized in pass 2
            guidance_scale=sampler.guidance_scale,
            added_cond=added_src,
            uncond_seq=uncond_seq,
            use_flash=use_flash,
            collect_trajectory=True,
        )
    else:
        final_src, refs = denoise(
            pipe,
            latent,
            ctx_src,
            P2ZControl(),
            guidance_scale=sampler.guidance_scale,
            added_cond=added_src,
            uncond_seq=uncond_seq,
            use_flash=use_flash,
            collect_records=True,
        )
    if only_sample:
        return pipe.latent2image(final_src), None

    # ---- pass 2: target prompt with attention-map guidance
    ctx_tgt, added_tgt = common.prepare_conditioning(
        pipe, [prompts[1]], sampler.height, sampler.width
    )
    if edit_dir is not None:
        ctx_tgt = ctx_tgt + edit_dir
    final = _guided_scan(
        common.grad_unet(pipe, latent.shape[1], cfg.remat_grad),
        pipe.unet_params,
        pipe.scheduler,
        latent,
        ctx_tgt,
        refs,
        jnp.asarray(sampler.guidance_scale, latent.dtype),
        jnp.asarray(cfg.guidance_amount, latent.dtype),
        added_tgt,
        uncond_seq,
        use_flash,
        src_traj=src_traj,
        ctx_src=ctx_src if cfg.recompute_refs else None,
        added_src=added_src if cfg.recompute_refs else None,
    )
    # Drain the device queue before decoding. Buffers are allocated at
    # DISPATCH on the tunneled TPU runtime, so without a sync the decode's
    # transients are claimed while pass 1 + pass 2 are still queued and the
    # recorded maps (donated into pass 2, ~6 GB at XL scale) are still
    # live — which OOMs a 16 GB chip at XL 512². A tiny fetch forces the
    # queue through pass 2, landing the donation frees first (~one RTT;
    # block_until_ready is not reliable on the tunneled platform).
    del refs
    np.asarray(final[:, :1, :1, 0])
    return pipe.latent2image(final_src), pipe.latent2image(final)
