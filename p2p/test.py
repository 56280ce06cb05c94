"""P2P PIE-Bench sweep (reference: p2p/test.py; edit type auto-selected by
word-count equality, categories 0-4 and 6-9)."""
import _bootstrap  # noqa: F401
from image_editing_framework_tpu.cli import test_main

if __name__ == "__main__":
    test_main("p2p")
