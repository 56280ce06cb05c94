"""P2P real-image editing CLI (reference: p2p/edit_real.py).

Flags: --sd_version --device --seed --source_prompt --target_prompt
       --source_image --inversion_type
Outputs: ./exp/{source,inversion,edit}.png
"""
import _bootstrap  # noqa: F401
from image_editing_framework_tpu.cli import edit_real_main
from image_editing_framework_tpu.core.config import P2PConfig

# p2p parameters (reference: p2p/edit_real.py:49-51)
cross_replace_steps = 0.8
self_replace_steps = 0.6
edit_type = "refine"  # ["refine", "replace"]

if __name__ == "__main__":
    edit_real_main(
        "p2p",
        method_kwargs={
            "config": P2PConfig(
                edit_type=edit_type,
                cross_replace_steps=cross_replace_steps,
                self_replace_steps=self_replace_steps,
            )
        },
    )
