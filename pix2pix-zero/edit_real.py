"""pix2pix-zero real-image editing CLI (reference: pix2pix-zero/edit_real.py)."""
import _bootstrap  # noqa: F401
from image_editing_framework_tpu.cli import edit_real_main

if __name__ == "__main__":
    edit_real_main(
        "p2z",
        default_source="a round cake with orange frosting on a wooden plate",
        default_target="a square cake with orange frosting on a wooden plate",
    )
