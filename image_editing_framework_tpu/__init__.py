"""TPU-native image editing framework.

A brand-new JAX / Flax / Pallas framework with the capabilities of the
AY-Liu/Image-Editing-Framework PyTorch reference: training-free, text-driven
image editing on Stable Diffusion (1.4 / 1.5 / 2.1 / SDXL) via four
attention-control methods:

* **P2P** (Prompt-to-Prompt)   — cross-attention map replace / refine / reweight
* **MasaCtrl**                 — mutual self-attention K/V sharing
* **PnP** (Plug-and-Play)      — spatial-feature + self-attention Q/K injection
* **pix2pix-zero**             — cross-attention-map guidance

Unlike the reference (stateful Python hooks monkey-patched into diffusers
modules; see /root/reference), this framework is designed TPU-first:

* models (UNet / VAE / CLIP text encoders) are implemented in Flax,
* controllers are *data* (precomputed schedules, mappers, gate tables)
  threaded through jit-compiled ``lax.scan`` denoising loops,
* every self-attention edit is expressed as per-batch-element Q/K/V index
  remapping inside a fused Pallas flash-attention kernel,
* cross-attention edits operate on explicitly materialized (cheap, K=77)
  probability maps inside XLA,
* the PIE-Bench sweep shards across chips via ``jax.sharding``.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (avoids importing jax at package import)."""
    api = {
        "load_pipeline": ("image_editing_framework_tpu.models.registry", "load_pipeline"),
        "SDPipeline": ("image_editing_framework_tpu.pipelines", "SDPipeline"),
        "ddim_invert": ("image_editing_framework_tpu.inversion.ddim", "ddim_invert"),
        "null_text_inversion": ("image_editing_framework_tpu.inversion.nti", "null_text_inversion"),
        "p2p_edit": ("image_editing_framework_tpu.methods.p2p", "p2p_edit"),
        "masactrl_edit": ("image_editing_framework_tpu.methods.masactrl", "masactrl_edit"),
        "pnp_edit": ("image_editing_framework_tpu.methods.pnp", "pnp_edit"),
        "p2z_edit": ("image_editing_framework_tpu.methods.p2z", "p2z_edit"),
        "run_sweep": ("image_editing_framework_tpu.eval.sweep", "run_sweep"),
    }
    if name in api:
        import importlib

        module, attr = api[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(name)
