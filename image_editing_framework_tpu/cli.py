"""Shared CLI driver logic for the per-method entry points.

The reference ships three scripts per method (edit_syn.py, edit_real.py,
test.py) with identical plumbing (SURVEY.md §2.1 #20-22); here the plumbing
lives once and the per-method shims (p2p/, masactrl/, pnp/, pix2pix-zero/
directories at the repo root) pass their method name + hyperparameters.
Flag names and defaults mirror the reference (p2p/edit_real.py:19-27);
``--device`` is accepted for CLI parity but ignored (TPU runtime).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from image_editing_framework_tpu.core import config as cfgs
from image_editing_framework_tpu.core.config import SamplerConfig
from image_editing_framework_tpu.inversion.ddim import ddim_invert
from image_editing_framework_tpu.inversion.nti import null_text_inversion
from image_editing_framework_tpu.methods.masactrl import masactrl_edit
from image_editing_framework_tpu.methods.p2p import p2p_edit
from image_editing_framework_tpu.methods.p2z import p2z_edit
from image_editing_framework_tpu.methods.pnp import pnp_edit
from image_editing_framework_tpu.utils.images import load_image, save_img

GUIDANCE_SCALE = 7.5
NUM_INFERENCE_STEPS = 50


def common_parser(
    name: str,
    default_seed: int = 42,
    default_source: str = "a gray horse in the field",
    default_target: str = "a whie horse in the field",
    real: bool = True,
    default_inversion: str = "null-text",
    method: Optional[str] = None,
) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(name)
    p.add_argument("--sd_version", type=str, default="1.5")
    p.add_argument("--device", type=int, default=0)  # parity; unused on TPU
    p.add_argument("--seed", type=int, default=default_seed)
    p.add_argument("--source_prompt", type=str, default=default_source)
    p.add_argument("--target_prompt", type=str, default=default_target)
    if real:
        p.add_argument("--source_image", type=str, default="./test.jpg")
        p.add_argument("--inversion_type", type=str, default=default_inversion)
    if method == "masactrl":
        # the reference controller's optional knobs
        # (masactrl/model/attention_control.py:16, sd_utils.py:73-77)
        p.add_argument("--neg_prompt", type=str, default="")
        p.add_argument("--step_idx", type=str, default=None,
                       help="comma-separated explicit step list (overrides start_step)")
        p.add_argument("--layer_idx", type=str, default=None,
                       help="comma-separated explicit layer list (overrides start_layer)")
    return p


def _int_list(spec: Optional[str]):
    if spec is None or spec == "":
        return None
    return tuple(int(x) for x in spec.split(",") if x.strip() != "")


def _masactrl_cli_kwargs(args, pipe, method_kwargs: Optional[dict]) -> dict:
    """Merge the masactrl-only CLI flags into method_kwargs."""
    kw = dict(method_kwargs or {})
    if getattr(args, "neg_prompt", ""):
        kw.setdefault("neg_prompt", args.neg_prompt)
    step_idx = _int_list(getattr(args, "step_idx", None))
    layer_idx = _int_list(getattr(args, "layer_idx", None))
    if step_idx is not None or layer_idx is not None:
        from image_editing_framework_tpu.methods.masactrl import (
            default_masactrl_config,
        )

        base = kw.get("config") or default_masactrl_config(pipe)
        kw["config"] = dataclasses.replace(
            base, step_idx=step_idx, layer_idx=layer_idx
        )
    return kw


def load_pipe(sd_version: str, dtype=jnp.bfloat16):
    from image_editing_framework_tpu.models.registry import load_pipeline

    return load_pipeline(sd_version, NUM_INFERENCE_STEPS, dtype=dtype)


def resolution_for(pipe) -> int:
    return 1024 if pipe.model_type == "xl" else 512


def nti_config_for(method: str, pipe) -> cfgs.NTIConfig:
    """lr schedule: p2p's XL variant uses 0.5*(1-i/500)
    (p2p/inversion/nti.py:50,69); the other methods' XL uses 5e-2*(1-i/100)
    (masactrl/inversion/nti.py:69); all SD variants use 1e-2*(1-i/100)."""
    if pipe.model_type == "xl":
        if method == "p2p":
            return cfgs.NTIConfig(base_lr=0.5, lr_decay_span=500.0)
        return cfgs.NTIConfig(base_lr=5e-2, lr_decay_span=100.0)
    return cfgs.NTIConfig()


def invert(pipe, image: np.ndarray, source_prompt: str, inversion_type: str,
           method: str, use_flash: bool = True):
    """Returns (start_latent, uncond_seq or None)."""
    latent = pipe.image2latent(image)
    last, traj, context, added_cond = ddim_invert(
        pipe, latent, source_prompt, use_flash=use_flash
    )
    uncond_seq = None
    if inversion_type == "null-text":
        uncond_seq = null_text_inversion(
            pipe, traj, context, nti_config_for(method, pipe),
            guidance_scale=GUIDANCE_SCALE, added_cond=added_cond,
            use_flash=use_flash,
        )
    elif inversion_type not in ("ddim", "direct"):
        raise ValueError("Please choose right inversion type")
    return last, traj, uncond_seq


def run_method(
    method: str,
    pipe,
    prompts,
    latent,
    sampler: SamplerConfig,
    uncond_seq=None,
    method_kwargs: Optional[dict] = None,
    source_replay=None,
):
    """Dispatch one edit; returns (inversion_image, edit_image).

    ``source_replay`` (the inversion trajectory) enables direct inversion:
    the source branch replays its recorded latents each step, pinning the
    reconstruction to the input while the target branch edits freely.
    """
    kw = dict(method_kwargs or {})
    if source_replay is not None and method != "p2z":
        kw.setdefault("source_replay", source_replay)
    if method == "p2p":
        cfg = kw.pop("config", cfgs.P2PConfig())
        imgs = p2p_edit(pipe, prompts, latent, cfg, sampler, uncond_seq=uncond_seq, **kw)
        return imgs[0], imgs[1]
    if method == "masactrl":
        from image_editing_framework_tpu.methods.masactrl import (
            default_masactrl_config,
        )

        cfg = kw.pop("config", None) or default_masactrl_config(pipe)
        imgs = masactrl_edit(
            pipe, prompts, latent, cfg, sampler, uncond_seq=uncond_seq, **kw
        )
        return imgs[0], imgs[1]
    if method == "pnp":
        cfg = kw.pop("config", cfgs.PnPConfig())
        imgs = pnp_edit(pipe, prompts, latent, cfg, sampler, uncond_seq=uncond_seq, **kw)
        return imgs[0], imgs[1]
    if method == "p2z":
        default_cfg = cfgs.P2ZConfig(recompute_refs=pipe.model_type == "xl")
        cfg = kw.pop("config", default_cfg)
        rec, edit = p2z_edit(
            pipe, prompts, latent, cfg, sampler, uncond_seq=uncond_seq, **kw
        )
        return rec[0], edit[0]
    raise ValueError(f"unknown method {method}")


def edit_real_main(method: str, argv=None, method_kwargs: Optional[dict] = None,
                   default_inversion: str = "null-text",
                   default_source: str = "a gray horse in the field",
                   default_target: str = "a whie horse in the field"):
    args = common_parser(
        f"{method} edit_real", real=True,
        default_inversion=default_inversion,
        default_source=default_source, default_target=default_target,
        method=method,
    ).parse_args(argv)
    pipe = load_pipe(args.sd_version)
    if method == "masactrl":
        method_kwargs = _masactrl_cli_kwargs(args, pipe, method_kwargs)
    res = resolution_for(pipe)
    sampler = SamplerConfig(height=res, width=res, seed=args.seed)
    out_path = "./exp"
    os.makedirs(out_path, exist_ok=True)
    image = load_image(args.source_image, res, res)
    save_img(image, os.path.join(out_path, "source.png"))
    latent, traj, uncond_seq = invert(
        pipe, image, args.source_prompt, args.inversion_type, method
    )
    replay = traj if args.inversion_type == "direct" else None
    inv_img, edit_img = run_method(
        method, pipe, [args.source_prompt, args.target_prompt], latent, sampler,
        uncond_seq, method_kwargs, source_replay=replay,
    )
    save_img(inv_img, os.path.join(out_path, "inversion.png"))
    save_img(edit_img, os.path.join(out_path, "edit.png"))


def edit_syn_main(method: str, argv=None, method_kwargs: Optional[dict] = None,
                  default_seed: int = 8888,
                  default_source: str = "a photo of a house on a mountain",
                  default_target: str = "a photo of a house on a mountain at fall"):
    args = common_parser(
        f"{method} edit_syn", real=False, default_seed=default_seed,
        default_source=default_source, default_target=default_target,
        method=method,
    ).parse_args(argv)
    pipe = load_pipe(args.sd_version)
    if method == "masactrl":
        method_kwargs = _masactrl_cli_kwargs(args, pipe, method_kwargs)
    res = resolution_for(pipe)
    sampler = SamplerConfig(height=res, width=res, seed=args.seed)
    out_path = "./exp"
    os.makedirs(out_path, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    latent = jax.random.normal(key, (1, res // 8, res // 8, 4), pipe.dtype)
    src_img, edit_img = run_method(
        method, pipe, [args.source_prompt, args.target_prompt], latent, sampler,
        None, method_kwargs,
    )
    save_img(src_img, os.path.join(out_path, "source.png"))
    save_img(edit_img, os.path.join(out_path, "edit.png"))


def test_main(method: str, argv=None, method_kwargs: Optional[dict] = None):
    """PIE-Bench sweep (reference test.py shape: hardcoded config, category
    loop skipping 5, per-image invert -> edit -> save)."""
    p = argparse.ArgumentParser(f"{method} test")
    p.add_argument("--sd_version", type=str, default="1.5")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--dataset_path", type=str, default="./PIE")
    p.add_argument("--exp_path", type=str, default="./test_exp")
    p.add_argument("--inversion_type", type=str, default="ddim")
    p.add_argument("--resume", action="store_true", default=True)
    p.add_argument("--shard_index", type=int, default=0)
    p.add_argument("--shard_count", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--inversion_path", type=str, default=None)
    p.add_argument("--save_inversions", type=str, default=None)
    args = p.parse_args(argv)
    pipe = load_pipe(args.sd_version)

    from image_editing_framework_tpu.eval.sweep import run_sweep

    run_sweep(
        pipe, method, args.dataset_path, args.exp_path,
        inversion_type=args.inversion_type, seed=args.seed,
        method_kwargs=method_kwargs, resume=args.resume,
        shard_index=args.shard_index, shard_count=args.shard_count,
        batch_size=args.batch_size, inversion_path=args.inversion_path,
        save_inversions=args.save_inversions,
    )
