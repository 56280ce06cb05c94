"""Real-weight validation runway.

The moment trained checkpoints exist, one command produces everything
BASELINE.md's empty quality cells need — golden-image hashes per seed for
every method plus CLIP-score / LPIPS / MSE / PSNR / SSIM — with zero new
code (VERDICT round-1 item 8). Until then the same flow is exercised in CI
with the tiny random-weight pipeline (tests/test_validate.py), so the first
environment with weights runs:

    python tools/validate_real_weights.py --sd_version 1.5 \
        --source_image ./test.jpg --out validation/

Reference quality strategy being replaced: committed example images only
(p2p/exp/*.png, SURVEY.md §4) — no hashes, no metrics.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Optional, Sequence

import jax
import numpy as np

from image_editing_framework_tpu.core.config import SamplerConfig
from image_editing_framework_tpu.eval import metrics
from image_editing_framework_tpu.utils.images import load_image, save_img

METHODS = ("p2p", "masactrl", "pnp", "p2z")


def _sha256_png(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _flash_layout_fields() -> dict:
    """Flash-kernel operand layouts active for this report, as golden fields.

    flash_layout (ops/flash_attention._use_t_layout): the transposed
    inference primal changes accumulation order and therefore golden hashes;
    reports written before the field existed pinned the classic layout
    (golden_check replays them under IEF_FLASH_T=0).

    flash_bwd_layout (ops/flash_attention._use_bwd_t_layout): changes
    gradient numerics for p2z/NTI; golden_check replays under the recorded
    value (missing field = classic, pre-round-4 reports). Tri-state: "auto"
    = the production default (T kernels at nq >= 4096 sites, classic below);
    "forced" = IEF_FLASH_BWD_T=1 (T at every site); "classic" = killswitched
    off everywhere. Recording forced distinctly from auto matters — a forced
    report replayed under auto would run classic backward kernels at
    sub-4096-token sites and spuriously fail the golden hashes."""
    t_off = os.environ.get("IEF_FLASH_T", "1") == "0"
    # Mirror the kernel predicate exactly (_use_bwd_t_layout): the var being
    # SET to anything != "0" forces the T backward — not just "1". A report
    # generated under e.g. "true" must record "forced", or golden_check would
    # replay it under auto and run classic backward kernels at sub-4096-token
    # sites, spuriously failing the hashes (ADVICE-r4).
    bwd_set = "IEF_FLASH_BWD_T" in os.environ
    bwd = os.environ.get("IEF_FLASH_BWD_T", "")
    return {
        "flash_layout": "classic" if t_off else "transposed",
        "flash_bwd_layout": (
            "classic" if t_off or (bwd_set and bwd == "0")
            else "forced" if bwd_set
            else "auto"
        ),
    }


def synth_source_image(seed: int, res: int) -> np.ndarray:
    """Deterministic synthetic photo-ish input (smooth random field) so the
    real-image flow (invert + edit + recon metrics) runs and hashes
    reproducibly with no dataset in the environment."""
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    small = rng.rand(res // 16, res // 16, 3)
    img = jax.image.resize(jnp.asarray(small), (res, res, 3), "cubic")
    return np.asarray(jnp.round(jnp.clip(img, 0, 1) * 255).astype(jnp.uint8))


def validate_pipeline(
    pipe,
    out_dir: str,
    methods: Sequence[str] = METHODS,
    source_image: Optional[np.ndarray] = None,  # uint8 HWC; None => synth only
    source_prompt: str = "a gray horse in the field",
    target_prompt: str = "a whie horse in the field",
    seed: int = 42,
    resolution: Optional[int] = None,
    inversion_type: str = "ddim",
    clip_checkpoint: Optional[str] = None,
    lpips_weights: Optional[str] = None,
    use_flash: Optional[bool] = None,
    provenance: Optional[str] = None,  # e.g. 'random_weights seed=42'
    sd_version: Optional[str] = None,  # recorded so golden_check can rebuild
) -> dict:
    """Run every method e2e on ``pipe``; write PNGs + report.json.

    Per method: a synthesized-source edit (edit_syn flow, seeded latent) and —
    when ``source_image`` is given — a real-image edit (invert + edit).
    Records sha256 of every PNG (golden hashes), structure metrics between
    source and reconstruction, and CLIP/LPIPS when their checkpoints are
    available. Deterministic for fixed (weights, seed, steps).
    """
    from image_editing_framework_tpu.cli import invert, run_method

    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"
    res = resolution or (1024 if pipe.model_type == "xl" else 512)
    sampler = SamplerConfig(height=res, width=res, seed=seed)
    os.makedirs(out_dir, exist_ok=True)

    clip_score = None
    if clip_checkpoint:
        clip_score = metrics.CLIPScore(clip_checkpoint)
    lpips = None
    if lpips_weights:
        from image_editing_framework_tpu.eval.lpips import LPIPS

        lpips = LPIPS(lpips_weights)

    report = {
        "seed": seed,
        "resolution": res,
        "num_steps": pipe.scheduler.num_steps,
        "model_type": pipe.model_type,
        "sd_version": sd_version,
        "inversion_type": inversion_type,
        "backend": jax.default_backend(),
        "decode_tile_latent": pipe.decode_tile_latent,
        # XL p2z rematerializes its reference maps (cli.run_method default);
        # the mode changes compiled-program numerics, so goldens record it.
        "p2z_recompute_refs": pipe.model_type == "xl" and "p2z" in methods,
        # Gradient programs (p2z guided step, NTI) ride a remat-twin UNet at
        # XL >= 1024² (methods/common.grad_unet auto rule). Bitwise-identical
        # grads, so hashes are unaffected; recorded for provenance.
        "grad_remat": pipe.model_type == "xl" and res >= 1024
        and ("p2z" in methods or inversion_type == "null-text"),
        **_flash_layout_fields(),
        "provenance": provenance or "loaded checkpoint",
        "methods": {},
    }

    lat_shape = (1, res // 8, res // 8, 4)
    syn_latent = jax.random.normal(jax.random.PRNGKey(seed), lat_shape, pipe.dtype)

    inv_cache = None  # (latent, traj, uncond_seq) shared across methods
    for method in methods:
        entry = {}
        mdir = os.path.join(out_dir, method)
        os.makedirs(mdir, exist_ok=True)

        # --- edit_syn flow (seeded latent)
        t0 = time.perf_counter()
        src_img, edit_img = run_method(
            method, pipe, [source_prompt, target_prompt], syn_latent, sampler,
            method_kwargs=_default_kwargs(method, pipe, use_flash),
        )
        entry["syn_elapsed_s"] = round(time.perf_counter() - t0, 3)
        p_src = os.path.join(mdir, "syn_source.png")
        p_edit = os.path.join(mdir, "syn_edit.png")
        save_img(src_img, p_src)
        save_img(edit_img, p_edit)
        entry["syn_source_sha256"] = _sha256_png(p_src)
        entry["syn_edit_sha256"] = _sha256_png(p_edit)
        if clip_score is not None:
            entry["syn_clip_score"] = clip_score(edit_img[None], [target_prompt])
        # checkpoint the syn hashes before the (often much longer) real flow:
        # an XL-scale run that dies mid-inversion keeps this method's syn half
        report["methods"][method] = entry
        with open(os.path.join(out_dir, "report.json"), "w") as f:
            json.dump(report, f, indent=2)

        # --- edit_real flow (invert + edit), when an input image is given
        if source_image is not None:
            # NTI lr schedules are method-dependent on XL (p2p 0.5/500 vs
            # others 5e-2/100, cli.nti_config_for) — only share the inversion
            # across methods when the schedule is identical.
            share = inversion_type != "null-text" or pipe.model_type != "xl"
            if inv_cache is None or not share:
                latent, traj, uncond_seq = invert(
                    pipe, source_image, source_prompt, inversion_type, method,
                    use_flash=use_flash,
                )
                inv_cache = (latent, traj, uncond_seq)
            latent, traj, uncond_seq = inv_cache
            t0 = time.perf_counter()
            inv_img, edit_img = run_method(
                method, pipe, [source_prompt, target_prompt], latent, sampler,
                uncond_seq, _default_kwargs(method, pipe, use_flash),
                source_replay=traj if inversion_type == "direct" else None,
            )
            entry["real_elapsed_s"] = round(time.perf_counter() - t0, 3)
            p_inv = os.path.join(mdir, "real_inversion.png")
            p_re = os.path.join(mdir, "real_edit.png")
            save_img(inv_img, p_inv)
            save_img(edit_img, p_re)
            entry["real_inversion_sha256"] = _sha256_png(p_inv)
            entry["real_edit_sha256"] = _sha256_png(p_re)
            # reconstruction fidelity vs the input (the reference's visual
            # inversion.png check, quantified)
            entry["recon_mse"] = metrics.mse(source_image, inv_img)
            entry["recon_psnr"] = metrics.psnr(source_image, inv_img)
            entry["recon_ssim"] = metrics.ssim(source_image, inv_img)
            if clip_score is not None:
                entry["real_clip_score"] = clip_score(
                    edit_img[None], [target_prompt]
                )
            if lpips is not None:
                entry["recon_lpips"] = float(lpips(source_image, inv_img))
        report["methods"][method] = entry
        # Write incrementally: an hour-long XL run that dies on its last
        # method must not lose the finished methods' hashes.
        with open(os.path.join(out_dir, "report.json"), "w") as f:
            json.dump(report, f, indent=2)
        _write_markdown(report, os.path.join(out_dir, "report.md"))
        # Each method compiles its own SD/XL-scale scan program; the live
        # executables accumulate device buffers and fragment HBM — at XL
        # 1024² the second method OOMs on a 16 GB chip with the first
        # method's programs still loaded. Recompiles are disk-cache hits
        # (jax_compilation_cache_dir), so dropping them is cheap.
        jax.clear_caches()
    return report


def validate_refiner(
    pipe,
    out_dir: str,
    source_image: np.ndarray,
    prompt: str = "a gray horse in the field",
    strength: float = 0.3,
    seed: int = 42,
    resolution: Optional[int] = None,
    use_flash: Optional[bool] = None,
    provenance: Optional[str] = None,
) -> dict:
    """Golden anchor for the refiner img2img flow (methods/img2img.py).

    The refiner is not an editing pipe — its capability is partial-denoise
    refinement (the role the reference loads it for but never invokes,
    p2p/edit_real.py:77-89) — so its golden flow is: refine a deterministic
    source image at ``strength`` and hash the output, recording structural
    similarity to the input (a 0.3-strength refinement must stay close)."""
    from image_editing_framework_tpu.methods.img2img import img2img

    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"
    res = resolution or source_image.shape[-3]
    os.makedirs(out_dir, exist_ok=True)
    p_src = os.path.join(out_dir, "source.png")
    save_img(source_image, p_src)

    t0 = time.perf_counter()
    out = img2img(
        pipe, source_image, prompt, strength=strength, seed=seed,
        use_flash=use_flash,
    )
    elapsed = round(time.perf_counter() - t0, 3)
    p_out = os.path.join(out_dir, "refined.png")
    save_img(out, p_out)

    report = {
        "flow": "img2img-refine",
        "seed": seed,
        "strength": strength,
        "resolution": res,
        "num_steps": pipe.scheduler.num_steps,
        "model_type": "xl-refiner",
        "backend": jax.default_backend(),
        "decode_tile_latent": pipe.decode_tile_latent,
        **_flash_layout_fields(),
        "provenance": provenance or "loaded checkpoint",
        "elapsed_s": elapsed,
        "source_sha256": _sha256_png(p_src),
        "refined_sha256": _sha256_png(p_out),
        "refine_mse": metrics.mse(source_image, out),
        "refine_psnr": metrics.psnr(source_image, out),
        "refine_ssim": metrics.ssim(source_image, out),
    }
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return report


def _default_kwargs(method: str, pipe, use_flash: bool) -> dict:
    kw = {"use_flash": use_flash}
    if method == "masactrl":
        from image_editing_framework_tpu.methods.masactrl import (
            default_masactrl_config,
        )

        kw["config"] = default_masactrl_config(pipe)
    return kw


def _write_markdown(report: dict, path: str) -> None:
    """The table that fills BASELINE.md's quality cells."""
    lines = [
        f"## Validation report (seed {report['seed']}, "
        f"{report['num_steps']} steps, {report['resolution']}^2, "
        f"{report['model_type']})",
        "",
        "| method | syn edit sha256 | recon PSNR | recon SSIM | CLIP | LPIPS |",
        "|---|---|---|---|---|---|",
    ]
    for m, e in report["methods"].items():
        lines.append(
            f"| {m} | `{e.get('syn_edit_sha256', '')[:16]}` | "
            f"{_fmt(e.get('recon_psnr'))} | {_fmt(e.get('recon_ssim'))} | "
            f"{_fmt(e.get('real_clip_score') or e.get('syn_clip_score'))} | "
            f"{_fmt(e.get('recon_lpips'))} |"
        )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _fmt(v) -> str:
    return "—" if v is None else f"{v:.4g}"


def main(argv=None) -> None:
    import argparse

    # validate_pipeline clears live executables after each method (HBM
    # headroom); the persistent cache makes any recompile a disk hit. Set
    # here, not only in the tools/ wrapper, so direct module invocation
    # (python -m ...eval.validate, golden_check) gets the same behavior.
    from ..utils.jax_cache import compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", compilation_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    p = argparse.ArgumentParser("real-weight validation runway")
    p.add_argument("--sd_version", type=str, default="1.5")
    p.add_argument("--path", type=str, default=None,
                   help="checkpoint dir (overrides sd_mapping)")
    p.add_argument("--out", type=str, default="./validation")
    p.add_argument("--source_image", type=str, default=None)
    p.add_argument("--source_prompt", type=str,
                   default="a gray horse in the field")
    p.add_argument("--target_prompt", type=str,
                   default="a whie horse in the field")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num_steps", type=int, default=50)
    p.add_argument("--inversion_type", type=str, default="ddim")
    p.add_argument("--methods", type=str, default=",".join(METHODS))
    p.add_argument("--clip_checkpoint", type=str, default=None)
    p.add_argument("--lpips_weights", type=str, default=None)
    p.add_argument("--random_weights", action="store_true",
                   help="production-shape pipeline with deterministic random "
                        "weights (pipelines.random_pipeline) — the on-chip "
                        "golden-hash anchor until checkpoints exist")
    p.add_argument("--resolution", type=int, default=None)
    p.add_argument("--report_name", type=str, default=None,
                   help="subdirectory under --out (default: --sd_version); "
                        "lets one model version carry several golden configs "
                        "(e.g. xl-base @1024 + xl-base-p2z512: single-chip "
                        "XL p2z records every cross site x 50 steps — "
                        "host-RAM-spill territory for the reference, "
                        "multi-chip CP territory here — so its single-chip "
                        "golden runs at 512)")
    p.add_argument("--decode_tile", type=int, default=None,
                   help="tiled-decode tile size in latent pixels (default: "
                        "64 for XL at >=1024², full-frame otherwise); the "
                        "tile size changes the seam blending and therefore "
                        "the golden hashes — reports record it")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    if args.random_weights:
        from image_editing_framework_tpu.pipelines import random_pipeline

        pipe = random_pipeline(
            args.sd_version, args.num_steps, dtype=jnp.bfloat16, seed=args.seed
        )
    else:
        from image_editing_framework_tpu.models.registry import load_pipeline

        pipe = load_pipeline(
            args.sd_version, args.num_steps, dtype=jnp.bfloat16, path=args.path
        )
    res = args.resolution or (1024 if pipe.model_type == "xl" else 512)
    if args.decode_tile is not None:
        pipe.decode_tile_latent = args.decode_tile
    elif pipe.model_type == "xl" and res >= 1024 and pipe.decode_tile_latent is None:
        # same memory-safety default as the sweep driver: the full-frame
        # 1024² decode doesn't fit next to the resident XL UNet + towers
        pipe.decode_tile_latent = 64
    image = None
    if args.source_image == "synth":
        image = synth_source_image(args.seed, res)
    elif args.source_image:
        image = load_image(args.source_image, res, res)
    if args.sd_version == "xl-refiner":
        # refiner flow: img2img golden anchor (random_pipeline returns the
        # refiner pipe directly; the registry attaches it as pipe.refiner
        # on an XL-base editing pipe)
        rpipe = pipe if args.random_weights else (pipe.refiner or pipe)
        if args.decode_tile is None and res >= 1024 and rpipe.decode_tile_latent is None:
            rpipe.decode_tile_latent = 64
        report = validate_refiner(
            rpipe,
            os.path.join(args.out, args.report_name or args.sd_version),
            source_image=image if image is not None else synth_source_image(args.seed, res),
            prompt=args.source_prompt,
            seed=args.seed,
            resolution=args.resolution,
            provenance=(
                f"random_weights seed={args.seed} (pipelines.random_pipeline)"
                if args.random_weights
                else None
            ),
        )
        print(json.dumps({"refined_sha256": report["refined_sha256"],
                          "refine_ssim": report["refine_ssim"]}, indent=2))
        return
    report = validate_pipeline(
        pipe,
        os.path.join(args.out, args.report_name or args.sd_version),
        methods=tuple(args.methods.split(",")),
        source_image=image,
        source_prompt=args.source_prompt,
        target_prompt=args.target_prompt,
        seed=args.seed,
        resolution=args.resolution,
        inversion_type=args.inversion_type,
        clip_checkpoint=args.clip_checkpoint,
        lpips_weights=args.lpips_weights,
        provenance=(
            f"random_weights seed={args.seed} (pipelines.random_pipeline)"
            if args.random_weights
            else None
        ),
        sd_version=args.sd_version,
    )
    print(json.dumps({m: e.get("syn_edit_sha256") for m, e in report["methods"].items()}, indent=2))


if __name__ == "__main__":
    main()
