"""PnP real-image editing CLI (reference: pnp/edit_real.py)."""
import _bootstrap  # noqa: F401
from image_editing_framework_tpu.cli import edit_real_main
from image_editing_framework_tpu.core.config import PnPConfig

# pnp parameters (reference: pnp/edit_real.py:45-46)
pnp_attn_t = 0.5
pnp_f_t = 0.8

if __name__ == "__main__":
    edit_real_main(
        "pnp",
        default_inversion="ddim",
        method_kwargs={"config": PnPConfig(pnp_attn_t=pnp_attn_t, pnp_f_t=pnp_f_t)},
    )
