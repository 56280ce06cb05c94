#!/usr/bin/env python
"""One-command real-weight validation: all four methods e2e, golden-image
hashes per seed, CLIP/LPIPS/PSNR/SSIM — fills BASELINE.md's quality cells
the moment checkpoints exist.

    python tools/validate_real_weights.py --sd_version 1.5 \
        --source_image ./test.jpg --out validation/ \
        [--clip_checkpoint /ckpts/clip-vit-b32] [--lpips_weights vgg16.safetensors]

Run again with --sd_version xl-base for the SDXL table.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Persistent compilation cache: validate compiles four methods' SD/XL-scale
# programs (and clears live executables between methods to bound HBM);
# repeats and re-runs hit the disk cache instead of recompiling for minutes.
from image_editing_framework_tpu.utils.jax_cache import compilation_cache_dir
jax.config.update("jax_compilation_cache_dir", compilation_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from image_editing_framework_tpu.eval.validate import main

if __name__ == "__main__":
    main()
