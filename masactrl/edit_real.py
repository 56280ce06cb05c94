"""MasaCtrl real-image editing CLI (reference: masactrl/edit_real.py)."""
import _bootstrap  # noqa: F401
from image_editing_framework_tpu.cli import edit_real_main

# masactrl parameters (reference: masactrl/edit_real.py:48-49; LAYPER becomes
# 54 for SDXL automatically, :118)
STEP = 4
LAYPER = 10

if __name__ == "__main__":
    edit_real_main("masactrl")
