"""pix2pix-zero synthetic-image editing CLI (reference: pix2pix-zero/edit_syn.py)."""
import _bootstrap  # noqa: F401
from image_editing_framework_tpu.cli import edit_syn_main

if __name__ == "__main__":
    edit_syn_main(
        "p2z",
        default_source="A photo of a cool boy with blue trousers",
        default_target="A photo of a cool boy with yellow trousers",
    )
