"""Convert a single-file (LDM layout) .safetensors checkpoint into the
diffusers directory layout this framework's registry loads fastest.

Usage:
  python tools/convert_checkpoint.py INPUT.safetensors OUTPUT_DIR \
      [--family sd|sd21|xl]

Writes OUTPUT_DIR/{unet,vae,text_encoder[,text_encoder_2]}/
diffusion_pytorch_model.safetensors (model.safetensors for text encoders).
Tokenizer files are not derivable from weights — copy a tokenizer/ directory
from the matching base checkpoint.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from safetensors.numpy import save_file

    from image_editing_framework_tpu.models import configs, convert_ldm
    from image_editing_framework_tpu.models.vae import VAEConfig

    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output_dir")
    ap.add_argument("--family", choices=["sd", "sd21", "xl"], default="sd")
    args = ap.parse_args()

    unet_cfg = {
        "sd": configs.SD15_UNET,
        "sd21": configs.SD21_UNET,
        "xl": configs.SDXL_UNET,
    }[args.family]
    vae_cfg = VAEConfig(
        scaling_factor=configs.SDXL_VAE_SCALING
        if args.family == "xl"
        else configs.SD_VAE_SCALING
    )

    if args.family == "xl":
        unet, vae, text1, text2 = convert_ldm.convert_single_file_xl(
            args.input, unet_cfg, vae_cfg
        )
        towers = [("text_encoder", text1), ("text_encoder_2", text2)]
    else:
        unet, vae, text1 = convert_ldm.convert_single_file(
            args.input, unet_cfg, vae_cfg
        )
        towers = [("text_encoder", text1)]

    def write(sub, base, tensors):
        d = os.path.join(args.output_dir, sub)
        os.makedirs(d, exist_ok=True)
        save_file(dict(tensors), os.path.join(d, base + ".safetensors"))
        print(f"wrote {sub}/{base}.safetensors ({len(tensors)} tensors)")

    write("unet", "diffusion_pytorch_model", unet)
    write("vae", "diffusion_pytorch_model", vae)
    for name, tensors in towers:
        write(name, "model", tensors)
    print("done — add a tokenizer/ (and tokenizer_2/ for XL) directory")


if __name__ == "__main__":
    main()
