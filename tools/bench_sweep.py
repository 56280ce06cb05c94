#!/usr/bin/env python
"""Measure sweep throughput: serial (batch_size=1) vs batched (batch_size=G).

Builds an SD1.5-architecture pipeline with random weights (compute cost
identical to trained weights), synthesizes a mini PIE-Bench at 512^2, and
runs `eval.sweep.run_sweep` in both modes — the number that quantifies the
batched-mode recovery of batch-1 inversion MXU underutilization
(BASELINE.md phase table; VERDICT round-1 item 5).

    python tools/bench_sweep.py [--images 8] [--batch_size 4] [--method p2p]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_pipe(num_steps: int = 50, model: str = "sd"):
    """Random-weight production-architecture pipeline ('sd' = SD1.5 at 512^2,
    'xl' = SDXL-base at 1024^2); compute cost identical to trained weights."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from image_editing_framework_tpu.core.scheduler import make_ddim_schedule
    from image_editing_framework_tpu.models import configs
    from image_editing_framework_tpu.models.clip import (
        CLIP_VIT_L,
        OPEN_CLIP_BIG_G,
        CLIPTextModel,
    )
    from image_editing_framework_tpu.models.init_utils import fast_random_params
    from image_editing_framework_tpu.models.tokenizer import WordTokenizer
    from image_editing_framework_tpu.models.unet import UNet2DCondition
    from image_editing_framework_tpu.models.vae import AutoencoderKL, VAEConfig
    from image_editing_framework_tpu.pipelines import SDPipeline

    dtype = jnp.bfloat16

    def cast(tree):
        # fast_random_params materializes flax's default f32 param leaves;
        # production checkpoints load as bf16 (registry dtype=bf16). XL f32
        # params alone (10.3 GB UNet + 2.8 GB bigG) would fill the chip.
        return jax.tree.map(
            lambda a: a.astype(dtype)
            if jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            tree,
        )

    is_xl = model == "xl"
    unet_cfg = configs.SDXL_UNET if is_xl else configs.SD15_UNET
    side = 128 if is_xl else 64
    ctx_dim = unet_cfg.cross_attention_dim
    unet = UNet2DCondition(unet_cfg, dtype=dtype)
    added = (
        {
            "text_embeds": jnp.zeros((1, 1280), dtype),
            "time_ids": jnp.zeros((1, 6), dtype),
        }
        if is_xl
        else None
    )
    unet_params = cast(fast_random_params(
        unet, jnp.zeros((1, side, side, 4), dtype), 0,
        jnp.zeros((1, 77, ctx_dim), dtype), None, added,
    ))
    vae = AutoencoderKL(VAEConfig(), dtype=dtype)
    vae_params = cast(fast_random_params(
        vae, jnp.zeros((1, side * 8, side * 8, 3), dtype), seed=1
    ))
    tokenizer = WordTokenizer()
    text_cfg = dataclasses.replace(CLIP_VIT_L, vocab_size=tokenizer.vocab_size)
    text = CLIPTextModel(text_cfg, dtype=dtype)
    text_params = cast(fast_random_params(
        text, jnp.zeros((1, 77), jnp.int32), seed=2
    ))
    pipe = SDPipeline(
        model_type="xl" if is_xl else "sd",
        unet=unet, unet_params=unet_params, vae=vae,
        vae_params=vae_params, text_encoder=text, text_params=text_params,
        tokenizer=tokenizer, scheduler=make_ddim_schedule(num_steps),
        dtype=dtype,
    )
    if is_xl:
        cfg2 = dataclasses.replace(
            OPEN_CLIP_BIG_G, vocab_size=tokenizer.vocab_size
        )
        text2 = CLIPTextModel(cfg2, dtype=dtype)
        pipe.text_encoder_2 = text2
        pipe.text_params_2 = cast(fast_random_params(
            text2, jnp.zeros((1, 77), jnp.int32), seed=3
        ))
        pipe.tokenizer_2 = tokenizer
    return pipe


def make_mini_pie(root: str, n: int, res: int = 512) -> None:
    from PIL import Image

    imgdir = os.path.join(root, "annotation_images", "0_random")
    os.makedirs(imgdir, exist_ok=True)
    rng = np.random.RandomState(0)
    mapping = {}
    for i in range(n):
        rel = f"0_random/img_{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (res, res, 3), np.uint8)).save(
            os.path.join(root, "annotation_images", rel)
        )
        mapping[str(i)] = {
            "image_path": rel,
            "original_prompt": f"a [cat] sitting on a chair {i}",
            "editing_prompt": f"a [dog] sitting on a chair {i}",
        }
    with open(os.path.join(root, "mapping_file.json"), "w") as f:
        json.dump(mapping, f)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--method", type=str, default="p2p")
    p.add_argument("--model", type=str, default="sd", choices=("sd", "xl"))
    p.add_argument("--num_steps", type=int, default=50)
    p.add_argument("--workdir", type=str, default="/tmp/ief_sweep_bench")
    args = p.parse_args()

    import jax

    from image_editing_framework_tpu.utils.jax_cache import compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", compilation_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from image_editing_framework_tpu.eval.sweep import run_sweep

    root = os.path.join(args.workdir, f"PIE_{args.model}")
    make_mini_pie(root, args.images, res=1024 if args.model == "xl" else 512)
    pipe = build_pipe(args.num_steps, args.model)

    results = {}
    for bs in (1, args.batch_size):
        exp = os.path.join(args.workdir, f"exp_bs{bs}_{time.time():.0f}")
        stats = run_sweep(
            pipe, args.method, root, exp, inversion_type="ddim",
            categories=(0,), batch_size=bs,
        )
        results[f"bs{bs}"] = stats
        print(f"batch_size={bs}: {json.dumps(stats)}", file=sys.stderr)

    s1 = results["bs1"]["steady_s_per_image"]
    sN = results[f"bs{args.batch_size}"]["steady_s_per_image"]
    print(json.dumps({
        "metric": f"sweep_steady_s_per_image_{args.method}_{args.model}",
        "serial_bs1": s1,
        f"batched_bs{args.batch_size}": sN,
        "speedup": round(s1 / sN, 3) if s1 and sN else None,
    }))


if __name__ == "__main__":
    main()
