"""P2P synthetic-image editing CLI (reference: p2p/edit_syn.py)."""
import _bootstrap  # noqa: F401
from image_editing_framework_tpu.cli import edit_syn_main
from image_editing_framework_tpu.core.config import P2PConfig

# p2p parameters (reference: p2p/edit_syn.py:41-42)
cross_replace_steps = 0.8
self_replace_steps = 0.4
edit_type = "refine"

if __name__ == "__main__":
    edit_syn_main(
        "p2p",
        method_kwargs={
            "config": P2PConfig(
                edit_type=edit_type,
                cross_replace_steps=cross_replace_steps,
                self_replace_steps=self_replace_steps,
            )
        },
    )
