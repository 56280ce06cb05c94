"""MasaCtrl synthetic-image editing CLI (reference: masactrl/edit_syn.py)."""
import _bootstrap  # noqa: F401
from image_editing_framework_tpu.cli import edit_syn_main

if __name__ == "__main__":
    edit_syn_main(
        "masactrl",
        default_source="1 new bedroom",
        default_target="1 new bedroom with a dog on the bed",
    )
