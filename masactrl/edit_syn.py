"""MasaCtrl synthetic-image editing CLI (reference: masactrl/edit_syn.py)."""
import _bootstrap  # noqa: F401
from image_editing_framework_tpu.cli import edit_syn_main

if __name__ == "__main__":
    edit_syn_main(
        "masactrl",
        default_source="A standing dog on the grass field",
        default_target="A running dog on the grass field",
    )
