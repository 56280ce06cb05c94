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
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from image_editing_framework_tpu.core.config import P2PConfig
from image_editing_framework_tpu.inversion.ddim import _invert_scan
from image_editing_framework_tpu.methods.base import LocalBlend, _denoise_scan
from image_editing_framework_tpu.ops import controls as ctl



def _encode_pairs(pipe, prompt_pairs, latents):
    """Contexts (G, 2P, 77, D) + per-image XL added conds (or None) for G
    prompt pairs in ONE text-encoder call (per-pair eager encodes dominated
    batched-group host time). For XL the time_ids derive from the latent
    spatial shape exactly like the serial inversion path (inversion/ddim.py)."""
    flat = [p for pair in prompt_pairs for p in pair]  # [s0, t0, s1, t1, ...]
    g, pp = len(prompt_pairs), len(prompt_pairs[0])
    context, added = pipe.encode_prompts(flat)  # (2*G*pp, 77, D)

    def fold(x):  # [uncond..., cond...] -> (G, 2pp, ...)
        u = x[: g * pp].reshape(g, pp, *x.shape[1:])
        c = x[g * pp :].reshape(g, pp, *x.shape[1:])
        return jnp.concatenate([u, c], axis=1)

    contexts = fold(context)
    added_cond = None
    if pipe.model_type == "xl":
        h, w = latents.shape[-3] * 8, latents.shape[-2] * 8
        tids = pipe.add_time_ids(h, w, 2 * pp)  # (2pp, n_ids)
        added_cond = {
            "text_embeds": fold(added["text_embeds"]),  # (G, 2pp, P)
            "time_ids": jnp.broadcast_to(tids[None], (g,) + tids.shape),
        }
    return contexts, added_cond


def stack_controls(items: Sequence) -> object:
    """Stack per-image control pytrees (static fields must agree)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *items)


@functools.partial(jax.jit, static_argnames=("unet", "use_flash"))
def _batched_invert(unet, params, sched, latents, conds, added, use_flash):
    def one(lat, cond, add):
        return _invert_scan(unet, params, sched, lat, cond, add, use_flash)

    axes = (0, 0, 0 if added is not None else None)
    # (last (G,1,...), traj (G,S+1,1,...))
    return jax.vmap(one, in_axes=axes)(latents, conds, added)


@functools.partial(
    jax.jit, static_argnames=("unet", "use_flash", "has_nti", "ctrl_stacked")
)
def _batched_edit(
    unet, params, sched, latents, contexts, ctrls, guidance, added,
    uncond_seqs, use_flash, has_nti, ctrl_stacked=True, source_replays=None,
):
    """ctrl_stacked: True when controls differ per image (P2P mappers/alphas);
    False broadcasts ONE control to the whole group (MasaCtrl / PnP gates are
    prompt-independent). ``added`` is the per-image XL added-cond dict
    (vmapped over the group) or None for SD. ``source_replays`` is the
    per-image inversion trajectory (G, S+1, 1, h, w, 4) for direct inversion
    (each image's source branch replays its own trajectory) or None."""

    def one(lat, ctx, c, useq, add, replay):
        return _denoise_scan(
            unet, params, sched, lat, ctx, c, guidance, add, useq,
            LocalBlend(jnp.zeros((1, 77))), replay, use_flash, False, False,
            False, None,
        )[0]

    axes = (
        0, 0, 0 if ctrl_stacked else None, 0 if has_nti else None,
        0 if added is not None else None,
        0 if source_replays is not None else None,
    )
    return jax.vmap(one, in_axes=axes)(
        latents, contexts, ctrls, uncond_seqs if has_nti else None, added,
        source_replays,
    )


def p2p_edit_batch(
    pipe,
    prompt_pairs: Sequence[Sequence[str]],  # G pairs [source, target]
    latents: jnp.ndarray,  # (G, 1, h, w, 4)
    cfgs: Optional[Sequence[P2PConfig]] = None,
    guidance_scale: float = 7.5,
    uncond_seqs: Optional[jnp.ndarray] = None,  # (G, S, 77, D) NTI embeddings
    use_flash: bool = True,
    source_replays: Optional[jnp.ndarray] = None,  # (G, S+1, 1, h, w, 4)
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
    contexts, added = _encode_pairs(pipe, prompt_pairs, latents)  # (G, 4, 77, D)
    lat0 = jnp.broadcast_to(latents, (g, 2) + latents.shape[2:])
    final = _batched_edit(
        pipe.unet, pipe.unet_params, pipe.scheduler, lat0, contexts, ctrls,
        jnp.asarray(guidance_scale, latents.dtype), added, uncond_seqs,
        use_flash, uncond_seqs is not None, source_replays=source_replays,
    )
    return _decode_pairs(pipe, final, g)


def _decode_pairs(pipe, final: jnp.ndarray, g: int):
    """(G, 2, h, w, 4) latents -> (G, 2, H, W, 3) uint8 in one decode."""
    imgs = pipe.latent2image(final.reshape((g * 2,) + final.shape[2:]))
    return imgs.reshape((g, 2) + imgs.shape[1:])


def _broadcast_ctrl_edit(
    pipe, prompt_pairs, latents, ctrl, guidance_scale, uncond_seqs, use_flash,
    source_replays=None,
):
    """Shared body for editors whose control is prompt-independent (one
    control pytree broadcasts to the whole group)."""
    g = len(prompt_pairs)
    contexts, added = _encode_pairs(pipe, prompt_pairs, latents)
    lat0 = jnp.broadcast_to(latents, (g, 2) + latents.shape[2:])
    final = _batched_edit(
        pipe.unet, pipe.unet_params, pipe.scheduler, lat0, contexts, ctrl,
        jnp.asarray(guidance_scale, latents.dtype), added, uncond_seqs,
        use_flash, uncond_seqs is not None, ctrl_stacked=False,
        source_replays=source_replays,
    )
    return _decode_pairs(pipe, final, g)


def masactrl_edit_batch(
    pipe,
    prompt_pairs: Sequence[Sequence[str]],
    latents: jnp.ndarray,  # (G, 1, h, w, 4)
    cfg=None,
    guidance_scale: float = 7.5,
    uncond_seqs: Optional[jnp.ndarray] = None,
    use_flash: bool = True,
    source_replays: Optional[jnp.ndarray] = None,
):
    """Edit G images with MasaCtrl in one program. The mutual-attention gate
    is prompt-independent (a (steps, layers) table), so ONE control broadcasts
    to the group. Returns (G, 2, H, W, 3) uint8 [reconstruction, edit]."""
    from image_editing_framework_tpu.methods.masactrl import (
        default_masactrl_config,
    )

    cfg = cfg or default_masactrl_config(pipe)
    ctrl = ctl.build_masactrl_control(
        pipe.scheduler.num_steps, pipe.unet.config.num_transformer_blocks, cfg
    )
    return _broadcast_ctrl_edit(
        pipe, prompt_pairs, latents, ctrl, guidance_scale, uncond_seqs,
        use_flash, source_replays=source_replays,
    )


def pnp_edit_batch(
    pipe,
    prompt_pairs: Sequence[Sequence[str]],
    latents: jnp.ndarray,  # (G, 1, h, w, 4)
    cfg=None,
    guidance_scale: float = 7.5,
    uncond_seqs: Optional[jnp.ndarray] = None,
    use_flash: bool = True,
    source_replays: Optional[jnp.ndarray] = None,
):
    """Edit G images with Plug-and-Play in one program (the injection gates
    are pure step tables — one control broadcasts)."""
    from image_editing_framework_tpu.core.config import PnPConfig
    from image_editing_framework_tpu.models import configs as model_configs

    cfg = cfg or PnPConfig()
    if pipe.model_type == "xl":
        attn_layers, conv_keys = model_configs.pnp_sites_xl(pipe.unet.config)
    else:
        attn_layers, conv_keys = model_configs.pnp_sites_sd(pipe.unet.config)
    ctrl = ctl.build_pnp_control(
        pipe.scheduler.num_steps, cfg, attn_layers, conv_keys
    )
    return _broadcast_ctrl_edit(
        pipe, prompt_pairs, latents, ctrl, guidance_scale, uncond_seqs,
        use_flash, source_replays=source_replays,
    )


@functools.partial(
    jax.jit, static_argnames=("unet", "use_flash", "has_nti", "recompute")
)
def _batched_p2z(
    unet, params, sched, latents, ctx_srcs, ctx_tgts, guidance, amount,
    added_s, added_t, uncond_seqs, use_flash, has_nti, recompute=False,
):
    from image_editing_framework_tpu.methods.p2z import _guided_scan
    from image_editing_framework_tpu.ops.controls import NoneControl, P2ZControl

    def one(lat, ctx_s, ctx_t, useq, add_s, add_t):
        if recompute:
            # recompute_refs: store only the pass-1 latent trajectory and
            # rematerialize each step's reference maps inside the guided
            # pass — G x S x sites of resident maps would OOM at XL scale.
            final_src, _, traj = _denoise_scan(
                unet, params, sched, lat, ctx_s, NoneControl(), guidance,
                add_s, useq, LocalBlend(jnp.zeros((1, 77))), None, use_flash,
                False, True, False, None,
            )
            final_tgt = _guided_scan(
                unet, params, sched, lat, ctx_t, None, guidance, amount,
                add_t, useq, use_flash, src_traj=traj, ctx_src=ctx_s,
                added_src=add_s,
            )
            return final_src, final_tgt
        final_src, refs, _ = _denoise_scan(
            unet, params, sched, lat, ctx_s, P2ZControl(), guidance, add_s,
            useq, LocalBlend(jnp.zeros((1, 77))), None, use_flash, True,
            False, False, None,
        )
        final_tgt = _guided_scan(
            unet, params, sched, lat, ctx_t, refs, guidance, amount, add_t,
            useq, use_flash,
        )
        return final_src, final_tgt

    has_added = added_s is not None
    axes = (
        0, 0, 0, 0 if has_nti else None,
        0 if has_added else None, 0 if has_added else None,
    )
    return jax.vmap(one, in_axes=axes)(
        latents, ctx_srcs, ctx_tgts, uncond_seqs if has_nti else None,
        added_s, added_t,
    )


def p2z_edit_batch(
    pipe,
    prompt_pairs: Sequence[Sequence[str]],
    latents: jnp.ndarray,  # (G, 1, h, w, 4)
    cfg=None,
    guidance_scale: float = 7.5,
    uncond_seqs: Optional[jnp.ndarray] = None,
    use_flash: bool = True,
):
    """pix2pix-zero for G images in one program: both passes vmapped, each
    image's recorded cross-attention refs threaded to its own guided pass.
    Returns (G, 2, H, W, 3) uint8 [reconstruction, edit]."""
    from image_editing_framework_tpu.core.config import P2ZConfig

    g = len(prompt_pairs)
    # same memory-discipline default as cli.run_method: XL rematerializes
    cfg = cfg or P2ZConfig(recompute_refs=pipe.model_type == "xl")
    ctx_srcs, added_s = _encode_pairs(
        pipe, [[pair[0]] for pair in prompt_pairs], latents
    )
    ctx_tgts, added_t = _encode_pairs(
        pipe, [[pair[1]] for pair in prompt_pairs], latents
    )
    final_src, final_tgt = _batched_p2z(
        pipe.unet, pipe.unet_params, pipe.scheduler, latents, ctx_srcs,
        ctx_tgts, jnp.asarray(guidance_scale, latents.dtype),
        jnp.asarray(cfg.guidance_amount, latents.dtype), added_s, added_t,
        uncond_seqs, use_flash, uncond_seqs is not None,
        recompute=cfg.recompute_refs,
    )
    both = jnp.concatenate([final_src, final_tgt], axis=1)  # (G, 2, h, w, 4)
    return _decode_pairs(pipe, both, g)


def edit_batch(
    method: str,
    pipe,
    prompt_pairs,
    latents,
    cfg=None,
    guidance_scale: float = 7.5,
    uncond_seqs=None,
    use_flash: bool = True,
    source_replays=None,
):
    """Dispatch a batched edit for any of the four methods (the single
    method->editor mapping shared by the sweep driver and the service).
    ``cfg`` is the method config; for p2p it may be a per-image list.
    ``source_replays`` (direct inversion, per-image trajectories) applies to
    every method except p2z — the serial dispatcher ignores it there too
    (cli.run_method): p2z's reconstruction pass IS its own source anchor."""
    if method == "p2p":
        cfgs = (
            list(cfg)
            if isinstance(cfg, (list, tuple))
            else None if cfg is None else [cfg] * len(prompt_pairs)
        )
        return p2p_edit_batch(
            pipe, prompt_pairs, latents, cfgs, guidance_scale,
            uncond_seqs=uncond_seqs, use_flash=use_flash,
            source_replays=source_replays,
        )
    fn = {
        "masactrl": masactrl_edit_batch,
        "pnp": pnp_edit_batch,
        "p2z": p2z_edit_batch,
    }.get(method)
    if fn is None:
        raise ValueError(f"unknown method {method}")
    kw = {} if method == "p2z" else {"source_replays": source_replays}
    return fn(
        pipe, prompt_pairs, latents, cfg, guidance_scale,
        uncond_seqs=uncond_seqs, use_flash=use_flash, **kw,
    )


def ddim_invert_batch(
    pipe,
    latents: jnp.ndarray,  # (G, 1, h, w, 4)
    prompts: Sequence[str],
    use_flash: bool = True,
    return_trajectory: bool = False,
):
    """Invert G images under their source prompts in one program."""
    g = len(prompts)
    context, added = pipe.encode_prompts(list(prompts))
    conds = context[g:][:, None]  # (G, 1, 77, D) cond halves
    added_cond = None
    if pipe.model_type == "xl":
        h, w = latents.shape[-3] * 8, latents.shape[-2] * 8
        tids = pipe.add_time_ids(h, w, 1)  # (1, n_ids)
        added_cond = {
            "text_embeds": added["text_embeds"][g:][:, None],  # (G, 1, P)
            "time_ids": jnp.broadcast_to(tids[None], (g,) + tids.shape),
        }
    last, traj = _batched_invert(
        pipe.unet, pipe.unet_params, pipe.scheduler, latents, conds,
        added_cond, use_flash,
    )
    if return_trajectory:
        return last, traj
    return last


def nti_batch(pipe, trajectories, prompts, cfg=None, guidance_scale: float = 7.5,
              use_flash: bool = True):
    """Batched null-text inversion for a group of images."""
    from image_editing_framework_tpu.core.config import NTIConfig
    from image_editing_framework_tpu.inversion.nti import null_text_inversion_batch

    g = len(prompts)
    emb, added = pipe.encode_prompts(list(prompts))  # (2G, 77, D): [uncond, cond]
    contexts = jnp.stack(
        [jnp.stack([emb[i], emb[g + i]]) for i in range(g)]
    )  # (G, 2, 77, D)
    added_conds = None
    if pipe.model_type == "xl":
        h = trajectories.shape[-3] * 8
        w = trajectories.shape[-2] * 8
        tids = pipe.add_time_ids(h, w, 1)  # (1, n_ids)
        added_conds = {
            "text_embeds": added["text_embeds"][g:][:, None],  # (G, 1, P)
            "time_ids": jnp.broadcast_to(tids[None], (g,) + tids.shape),
            # NTI's uncond branch runs with the negative pooled embeds
            # (masactrl/inversion/nti.py:59,75) — split out downstream.
            "uncond_text_embeds": added["text_embeds"][:g][:, None],
        }
    return null_text_inversion_batch(
        pipe, trajectories, contexts, cfg or NTIConfig(),
        guidance_scale=guidance_scale, added_conds=added_conds,
        use_flash=use_flash,
    )


def nti_group_serial(pipe, trajectories, prompts, cfg=None,
                     guidance_scale: float = 7.5, use_flash: bool = True):
    """Per-image serial NTI over a batched-invert trajectory stack.

    The vmapped variant (``nti_batch``) iterates every timestep's inner Adam
    ``while_loop`` until the SLOWEST image in the group converges — vmap
    runs a while_loop until all lanes stop — so it forfeits the per-image
    early stop (p2p/inversion/nti.py:32) that gives serial NTI its speed
    (measured: batch-4 16.83 s/image vs the 11.46 s serial envelope,
    validation/nti_cache_rehearsal.json). The batched sweep therefore runs
    DDIM-invert and the edit batched but NTI per image; the serial programs
    here share the compile cache with the batch_size=1 path (same shapes).
    """
    from image_editing_framework_tpu.core.config import NTIConfig
    from image_editing_framework_tpu.inversion.nti import null_text_inversion

    g = len(prompts)
    emb, added = pipe.encode_prompts(list(prompts))  # (2G, 77, D)
    tids = None
    if pipe.model_type == "xl":
        h = trajectories.shape[-3] * 8
        w = trajectories.shape[-2] * 8
        tids = pipe.add_time_ids(h, w, 1)  # (1, n_ids)
    out = []
    for i in range(g):
        context = jnp.stack([emb[i], emb[g + i]])  # (2, 77, D)
        added_cond = None
        if pipe.model_type == "xl":
            added_cond = {
                "text_embeds": added["text_embeds"][g + i][None],  # (1, P)
                "time_ids": tids,
                "uncond_text_embeds": added["text_embeds"][i][None],
            }
        out.append(null_text_inversion(
            pipe, trajectories[i], context, cfg or NTIConfig(),
            guidance_scale=guidance_scale, added_cond=added_cond,
            use_flash=use_flash,
        ))
    return jnp.stack(out)
