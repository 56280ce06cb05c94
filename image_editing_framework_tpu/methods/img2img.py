"""Image-to-image refinement (SDEdit-style partial denoising).

Covers the XL refiner's role: the reference's ``xl-refiner`` branch loads a
StableDiffusionXLImg2ImgPipeline (p2p/edit_real.py:77-89) — though none of
its edit flows ever invoke it — so the equivalent capability lives here:
noise an image's latent to ``strength`` of the schedule and denoise the tail.
The refiner UNet's ``time_ids`` carry (orig_size, crop, aesthetic_score)
instead of target_size: 5 ids x 256 dims + 1280 pooled = the 2560 projection
input of SDXL_REFINER_UNET.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from image_editing_framework_tpu.core.scheduler import add_noise, ddim_step


def refiner_time_ids(height: int, width: int, batch: int,
                     aesthetic_score: float = 6.0) -> jnp.ndarray:
    """(orig_h, orig_w, crop_t, crop_l, aesthetic_score) — the refiner's
    addition ids (5 x 256 time embeddings + 1280 pooled = 2560)."""
    ids = jnp.asarray([[height, width, 0, 0, aesthetic_score]], jnp.float32)
    return jnp.broadcast_to(ids, (batch, 5))


def img2img(
    pipe,
    image: np.ndarray,  # uint8 (H, W, 3) or (1, H, W, 3)
    prompt: str,
    strength: float = 0.3,
    guidance_scale: float = 7.5,
    seed: int = 0,
    aesthetic_score: float = 6.0,
    negative_aesthetic_score: float = 2.5,
    use_flash: bool = True,
) -> np.ndarray:
    """Partial-denoise refinement of an existing image."""
    sched = pipe.scheduler
    s = sched.num_steps
    start = max(0, min(s - 1, int(s * (1.0 - strength))))

    latent = pipe.image2latent(image)
    noise = jax.random.normal(jax.random.PRNGKey(seed), latent.shape, latent.dtype)
    t_start = sched.timesteps[start]
    lat = add_noise(sched, latent, noise, t_start)

    context, added = pipe.encode_prompts([prompt])
    added_cond = None
    if pipe.model_type == "xl":
        hh = latent.shape[1] * 8
        ww = latent.shape[2] * 8
        # pipe.add_time_ids emits the refiner's 5-id (orig, crop,
        # aesthetic_score) layout when pipe.is_refiner, else the base 6-id
        # one. The CFG batch is [uncond, cond]: the unconditional half gets
        # negative_aesthetic_score (diffusers
        # StableDiffusionXLImg2ImgPipeline._get_add_time_ids semantics with
        # requires_aesthetics_score — defaults 6.0 / 2.5).
        tids = jnp.concatenate(
            [
                pipe.add_time_ids(hh, ww, 1, negative_aesthetic_score),
                pipe.add_time_ids(hh, ww, 1, aesthetic_score),
            ]
        )
        added_cond = {"text_embeds": added["text_embeds"], "time_ids": tids}

    def step(lat, i):
        t = sched.timesteps[i]
        lat_in = jnp.concatenate([lat] * 2, axis=0)
        eps, _ = pipe.unet_apply(lat_in, t, context, None, added_cond, use_flash)
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        eps_g = eps_u + guidance_scale * (eps_c - eps_u)
        return ddim_step(sched, eps_g, i, lat), None

    lat, _ = jax.lax.scan(step, lat, jnp.arange(start, s))
    return pipe.latent2image(lat)
