"""Checkpoint registry (edit paths here — reference parity: p2p/sd_mapping.py)."""
import _bootstrap  # noqa: F401
from image_editing_framework_tpu.sd_mapping import sd_maps  # noqa: F401
