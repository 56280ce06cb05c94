"""Null-text inversion, jitted end-to-end.

Reference (p2p/inversion/nti.py:9-45): per denoising step, Adam-optimize the
unconditional embedding so that the CFG step from the current latent hits the
recorded inversion-trajectory latent, with early stopping at
``loss < epsilon + i * 2e-5``; then advance the latent with the optimized
embedding. The data-dependent inner iteration count becomes a
``lax.while_loop`` (hard part #3, SURVEY.md §7) — the early-stop speedup is
preserved because the while_loop terminates per-step, not at a static bound.

Adam is inlined (bias-corrected, torch defaults beta=(0.9, 0.999), eps=1e-8)
because the learning rate is a traced function of the step index
(``base_lr * (1 - i / span)``, p2p/inversion/nti.py:17).

Variant semantics: the SD NTI *carries* the optimized embedding into the next
step's initialization (nti.py:15 reuses the loop variable); the XL variant
*resets* to the original negative embedding each step (nti.py:61) —
``reset_each_step`` selects this.

XL added-cond semantics (masactrl/inversion/nti.py:58-66): the cond UNet
evaluation uses the *pooled prompt* embeds while every uncond evaluation uses
the *negative pooled* embeds (time_ids are shared) — ``added_uncond`` carries
the latter. Callers that only have the inversion-time dict can pass an
``added_cond`` containing the extra key ``uncond_text_embeds`` (as returned by
``ddim_invert``) and the split happens here.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from image_editing_framework_tpu.core.config import NTIConfig
from image_editing_framework_tpu.core.scheduler import DDIMSchedule, ddim_step


@functools.partial(
    jax.jit,
    static_argnames=("unet", "num_inner_steps", "reset_each_step", "use_flash"),
)
def _nti_scan(
    unet,
    unet_params,
    sched: DDIMSchedule,
    trajectory: jnp.ndarray,  # (S+1, 1, h, w, 4)
    cond_emb: jnp.ndarray,  # (1, 77, D)
    uncond0: jnp.ndarray,  # (1, 77, D)
    guidance_scale,
    base_lr,
    lr_decay_span,
    epsilon,
    added_cond,
    added_uncond,
    num_inner_steps: int,
    reset_each_step: bool,
    use_flash: bool,
):
    s = sched.num_steps
    # NTI optimizes in float32 regardless of the pipeline compute dtype (the
    # reference optimizes a float32 embedding against float32 latents):
    # promote the embeddings AND the latent trajectory here so the
    # while_loop/scan carries have stable dtypes — the f32 CFG mix below
    # would otherwise promote a bf16 latent carry mid-scan. The UNet casts
    # its inputs to its own compute dtype internally.
    uncond0 = uncond0.astype(jnp.float32)
    cond_emb = cond_emb.astype(jnp.float32)
    trajectory = trajectory.astype(jnp.float32)

    if added_uncond is None:
        added_uncond = added_cond

    def unet_eps(lat, t, ctx, add, flash):
        eps, _ = unet.apply(unet_params, lat, t, ctx, None, add, flash)
        return eps

    def outer(carry, i):
        latent_cur, uncond_carry = carry
        target = trajectory[s - 1 - i]
        t = sched.timesteps[i]
        lr = base_lr * (1.0 - i.astype(jnp.float32) / lr_decay_span)
        eps_c = unet_eps(latent_cur, t, cond_emb, added_cond, use_flash)

        def loss_fn(u):
            eps_u = unet_eps(latent_cur, t, u, added_uncond, use_flash)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
            prev = ddim_step(sched, eps, i, latent_cur)
            return jnp.mean((prev - target) ** 2)

        grad_fn = jax.value_and_grad(loss_fn)
        thresh = epsilon + i.astype(jnp.float32) * 2e-5

        def cond_fun(state):
            _, _, _, j, loss = state
            return (j < num_inner_steps) & (loss >= thresh)

        def body_fun(state):
            u, m, v, j, _ = state
            loss, g = grad_fn(u)
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * jnp.square(g)
            mh = m / (1.0 - 0.9 ** (j + 1).astype(jnp.float32))
            vh = v / (1.0 - 0.999 ** (j + 1).astype(jnp.float32))
            u = u - lr * mh / (jnp.sqrt(vh) + 1e-8)
            return (u, m, v, j + 1, loss)

        u0 = uncond0 if reset_each_step else uncond_carry
        state = (
            u0,
            jnp.zeros_like(u0),
            jnp.zeros_like(u0),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(jnp.inf, jnp.float32),
        )
        u_opt, _, _, _, _ = jax.lax.while_loop(cond_fun, body_fun, state)

        # Advance latent with the optimized embedding (nti.py:37-43).
        eps_u = unet_eps(latent_cur, t, u_opt, added_uncond, use_flash)
        eps = eps_u + guidance_scale * (eps_c - eps_u)
        latent_next = ddim_step(sched, eps, i, latent_cur)
        return (latent_next, u_opt), u_opt[0]

    (_, _), uncond_seq = jax.lax.scan(
        outer, (trajectory[-1], uncond0), jnp.arange(s)
    )
    return uncond_seq  # (S, 77, D)


def _split_added(added_cond):
    """Split an added-cond dict carrying ``uncond_text_embeds`` into the
    (cond, uncond) pair the XL NTI evaluates its two branches with
    (masactrl/inversion/nti.py:58-59: added_cond_kwargs vs added_uncond_kwargs;
    time_ids are shared, :57)."""
    if added_cond is None or "uncond_text_embeds" not in added_cond:
        return added_cond, None
    cond = {"text_embeds": added_cond["text_embeds"], "time_ids": added_cond["time_ids"]}
    uncond = {"text_embeds": added_cond["uncond_text_embeds"], "time_ids": added_cond["time_ids"]}
    return cond, uncond


def null_text_inversion_batch(
    pipe,
    trajectories: jnp.ndarray,  # (G, S+1, 1, h, w, 4)
    contexts: jnp.ndarray,  # (G, 2, 77, D)
    cfg: NTIConfig = NTIConfig(),
    guidance_scale: float = 7.5,
    added_conds: Optional[Dict[str, jnp.ndarray]] = None,  # (G, 1, ...) leaves
    use_flash: bool = True,
) -> jnp.ndarray:
    """Optimize G images' null-text embeddings in one vmapped program.

    The early-stop while_loop batches soundly (JAX freezes finished
    elements); cost per step is the max inner-iteration count in the group.
    ``added_conds`` carries per-image XL added conditions (text_embeds,
    time_ids), vmapped over the group. Returns (G, S, 77, D).
    """
    import jax

    from image_editing_framework_tpu.methods.common import grad_unet

    added_conds, added_unconds = _split_added(added_conds)
    unet = grad_unet(pipe, trajectories.shape[-3], cfg.remat)

    def one(traj, ctx, add, add_u):
        return _nti_scan(
            unet,
            pipe.unet_params,
            pipe.scheduler,
            traj,
            ctx[1:],
            ctx[:1],
            jnp.asarray(guidance_scale, jnp.float32),
            jnp.asarray(cfg.base_lr, jnp.float32),
            jnp.asarray(cfg.lr_decay_span, jnp.float32),
            jnp.asarray(cfg.epsilon, jnp.float32),
            add,
            add_u,
            cfg.num_inner_steps,
            pipe.model_type == "xl",
            use_flash,
        )

    axes = (
        0,
        0,
        0 if added_conds is not None else None,
        0 if added_unconds is not None else None,
    )
    return jax.vmap(one, in_axes=axes)(
        trajectories, contexts, added_conds, added_unconds
    )


def null_text_inversion(
    pipe,
    trajectory: jnp.ndarray,
    context: jnp.ndarray,  # (2, 77, D) [uncond, cond]
    cfg: NTIConfig = NTIConfig(),
    guidance_scale: float = 7.5,
    added_cond: Optional[Dict[str, jnp.ndarray]] = None,
    use_flash: bool = True,
) -> jnp.ndarray:
    """Returns per-step optimized uncond embeddings (S, 77, D)."""
    from image_editing_framework_tpu.methods.common import grad_unet

    uncond0, cond = context[:1], context[1:]
    added_cond, added_uncond = _split_added(added_cond)
    return _nti_scan(
        grad_unet(pipe, trajectory.shape[-3], cfg.remat),
        pipe.unet_params,
        pipe.scheduler,
        trajectory,
        cond,
        uncond0,
        jnp.asarray(guidance_scale, jnp.float32),
        jnp.asarray(cfg.base_lr, jnp.float32),
        jnp.asarray(cfg.lr_decay_span, jnp.float32),
        jnp.asarray(cfg.epsilon, jnp.float32),
        added_cond,
        added_uncond,
        cfg.num_inner_steps,
        pipe.model_type == "xl",
        use_flash,
    )
