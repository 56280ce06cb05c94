"""Checkpoint location registry (user-editable, reference parity).

The reference instructs users to edit this mapping to point at their weights
(README.md:30, p2p/sd_mapping.py:1-6). Values here must be *local
directories* in the HuggingFace snapshot layout (unet/, vae/, text_encoder/,
tokenizer/ subfolders with safetensors weights) — this framework performs no
network access. Single-file community checkpoints (.safetensors) are also
accepted for the entries marked single_file.
"""

sd_maps = {
    "1.4": "/checkpoints/stable-diffusion-v1-4",
    "1.5": "/checkpoints/stable-diffusion-v1-5",
    "2.1": "/checkpoints/stable-diffusion-2-1",
    "xl-base": "/checkpoints/stable-diffusion-xl-base-1.0",
    # 'xl-refiner' selects an XL-*base* editing pipeline plus an attached
    # refiner img2img pipeline (reference: p2p/edit_real.py:77-89 loads
    # StableDiffusionXLPipeline from sd_maps[version] and the refiner from a
    # separate hardcoded key) — so this entry points at base-layout weights.
    "xl-refiner": "/checkpoints/stable-diffusion-xl-base-1.0",
    # single-file community checkpoints (reference: p2p/edit_real.py:92-98)
    "animagineXL": "/checkpoints/animagine-xl.safetensors",
    "ghostv2": "/checkpoints/ghostmix-v2.safetensors",
    "cf": "/checkpoints/counterfeit.safetensors",
    "anythingv4-5": "/checkpoints/anything-v4.5.safetensors",
}

# The refiner checkpoint location (reference hardcodes
# refiner_key = "stabilityai/stable-diffusion-xl-refiner-1.0",
# p2p/edit_real.py:32); loaded alongside the base pipe for sd_version
# 'xl-refiner', sharing text_encoder_2/vae with it.
refiner_key = "/checkpoints/stable-diffusion-xl-refiner-1.0"
