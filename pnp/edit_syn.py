"""PnP synthetic-image editing CLI (reference: pnp/edit_syn.py; joint call
with full-strength injection, :39-40)."""
import _bootstrap  # noqa: F401
from image_editing_framework_tpu.cli import edit_syn_main
from image_editing_framework_tpu.core.config import PnPConfig

pnp_attn_t = 1.0
pnp_f_t = 1.0

if __name__ == "__main__":
    edit_syn_main(
        "pnp",
        default_source=("A crisp, juicy green apple sits perched on a wooden "
                        "table, its smooth surface glistening in the light"),
        default_target=("A crisp, juicy red apple sits perched on a wooden "
                        "table, its smooth surface glistening in the light"),
        method_kwargs={"config": PnPConfig(pnp_attn_t=pnp_attn_t, pnp_f_t=pnp_f_t)},
    )
