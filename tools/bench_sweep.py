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


def build_sd15_pipe(num_steps: int = 50):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from image_editing_framework_tpu.core.scheduler import make_ddim_schedule
    from image_editing_framework_tpu.models import configs
    from image_editing_framework_tpu.models.clip import CLIP_VIT_L, CLIPTextModel
    from image_editing_framework_tpu.models.init_utils import fast_random_params
    from image_editing_framework_tpu.models.tokenizer import WordTokenizer
    from image_editing_framework_tpu.models.unet import UNet2DCondition
    from image_editing_framework_tpu.models.vae import AutoencoderKL, VAEConfig
    from image_editing_framework_tpu.pipelines import SDPipeline

    dtype = jnp.bfloat16
    unet = UNet2DCondition(configs.SD15_UNET, dtype=dtype)
    unet_params = fast_random_params(
        unet, jnp.zeros((1, 64, 64, 4), dtype), 0, jnp.zeros((1, 77, 768), dtype)
    )
    vae = AutoencoderKL(VAEConfig(), dtype=dtype)
    vae_params = fast_random_params(vae, jnp.zeros((1, 512, 512, 3), dtype), seed=1)
    tokenizer = WordTokenizer()
    text_cfg = dataclasses.replace(CLIP_VIT_L, vocab_size=tokenizer.vocab_size)
    text = CLIPTextModel(text_cfg, dtype=dtype)
    text_params = fast_random_params(
        text, jnp.zeros((1, 77), jnp.int32), seed=2
    )
    return SDPipeline(
        model_type="sd", unet=unet, unet_params=unet_params, vae=vae,
        vae_params=vae_params, text_encoder=text, text_params=text_params,
        tokenizer=tokenizer, scheduler=make_ddim_schedule(num_steps),
        dtype=dtype,
    )


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
    p.add_argument("--num_steps", type=int, default=50)
    p.add_argument("--workdir", type=str, default="/tmp/ief_sweep_bench")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ief_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from image_editing_framework_tpu.eval.sweep import run_sweep

    root = os.path.join(args.workdir, "PIE")
    make_mini_pie(root, args.images)
    pipe = build_sd15_pipe(args.num_steps)

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
        "metric": f"sweep_steady_s_per_image_{args.method}",
        "serial_bs1": s1,
        f"batched_bs{args.batch_size}": sN,
        "speedup": round(s1 / sN, 3) if s1 and sN else None,
    }))


if __name__ == "__main__":
    main()
