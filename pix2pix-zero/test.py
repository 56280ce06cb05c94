"""pix2pix-zero PIE-Bench sweep (reference: pix2pix-zero/test.py)."""
import _bootstrap  # noqa: F401
from image_editing_framework_tpu.cli import test_main

if __name__ == "__main__":
    test_main("p2z")
