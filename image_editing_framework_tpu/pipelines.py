"""Model bundle: tokenizer + text encoder(s) + UNet + VAE + scheduler.

Replaces the reference's diffusers ``StableDiffusionPipeline`` /
``StableDiffusionXLPipeline`` objects (loaded at p2p/edit_real.py:71-98).
All compute methods are pure functions over explicit params so the editors
can jit/scan over them.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from image_editing_framework_tpu.core.scheduler import DDIMSchedule, make_ddim_schedule
from image_editing_framework_tpu.models.clip import CLIPTextModel
from image_editing_framework_tpu.models.unet import UNet2DCondition
from image_editing_framework_tpu.models.vae import AutoencoderKL


@dataclasses.dataclass
class SDPipeline:
    """A loaded Stable Diffusion model family instance.

    model_type: 'sd' (1.4/1.5/2.1) or 'xl' (SDXL base/refiner).
    """

    model_type: str
    unet: UNet2DCondition
    unet_params: Any
    vae: AutoencoderKL
    vae_params: Any
    text_encoder: CLIPTextModel
    text_params: Any
    tokenizer: Any
    scheduler: DDIMSchedule
    text_encoder_2: Optional[CLIPTextModel] = None
    text_params_2: Any = None
    tokenizer_2: Any = None
    dtype: Any = jnp.float32
    # SDXL refiner flavor: single bigG text tower (1280-wide context),
    # (orig, crop, aesthetic_score) time ids, real (non-zero) uncond encode.
    is_refiner: bool = False
    # The attached img2img refinement pipeline when this pipe was loaded as
    # sd_version='xl-refiner' (reference: p2p/edit_real.py:77-89 loads the
    # refiner alongside the XL-base editing pipe, sharing text_encoder_2/vae).
    refiner: Optional["SDPipeline"] = None
    # Default latent tile size for decodes (None = full-frame decode). When
    # set, latent2image tiles unless an explicit tile_latent overrides it —
    # the memory-safety default for XL 1024² sweeps, where the full decode's
    # activations don't fit next to the resident UNet + both text towers.
    decode_tile_latent: Optional[int] = None

    # ------------------------------------------------------------------ text

    def _jitted(self, name: str, fn):
        """Per-pipeline jit cache: text/vae forwards are hot per-image host
        calls (tokenize -> encode, image2latent, latent2image); running them
        eagerly dispatches hundreds of single ops per call on TPU."""
        cache = self.__dict__.setdefault("_jit_cache", {})
        if name not in cache:
            cache[name] = jax.jit(fn)
        return cache[name]

    def _text_forward(self, ids: jnp.ndarray, second: bool = False):
        if second:
            return self._jitted(
                "text2", lambda p, i: self.text_encoder_2.apply(p, i)
            )(self.text_params_2, ids)
        return self._jitted("text", lambda p, i: self.text_encoder.apply(p, i))(
            self.text_params, ids
        )

    def _token_ids(self, prompts: Sequence[str], tokenizer=None) -> jnp.ndarray:
        from image_editing_framework_tpu.models.tokenizer import pad_token_ids

        tok = tokenizer or self.tokenizer
        return jnp.asarray(pad_token_ids(tok, list(prompts)))

    def encode_prompts_sd(
        self, prompts: Sequence[str], negative_prompt: str = ""
    ) -> jnp.ndarray:
        """(2P, 77, D) context = [uncond x P, cond x P]
        (reference get_context, p2p/inversion/ddim.py:43-57; MasaCtrl's
        neg_prompt option, masactrl/model/sd_utils.py:74-77)."""
        p = len(prompts)
        ids = self._token_ids(list(prompts) + [negative_prompt] * p)
        emb = self._text_forward(ids)["last_hidden_state"]
        cond, uncond = emb[:p], emb[p:]
        return jnp.concatenate([uncond, cond], axis=0)

    def encode_prompts_xl(
        self, prompts: Sequence[str], negative_prompt: str = ""
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """SDXL dual-encoder: returns (context (2P,77,2048), pooled (2P,1280)).

        Mirrors diffusers encode_prompt with force_zeros_for_empty_prompt:
        the unconditional context/pooled are zeros for an empty negative
        prompt (used via p2p/model/sd_utils.py:189-222) and the encoded
        negative prompt otherwise.
        """
        p = len(prompts)

        def encode(texts):
            ids1 = self._token_ids(texts)
            ids2 = self._token_ids(texts, self.tokenizer_2 or self.tokenizer)
            out1 = self._text_forward(ids1)
            out2 = self._text_forward(ids2, second=True)
            ctx = jnp.concatenate(
                [out1["penultimate"], out2["penultimate"]], axis=-1
            )
            return ctx, out2["pooled"]

        cond, pooled = encode(list(prompts))
        if negative_prompt:
            uncond, upooled = encode([negative_prompt] * p)
        else:
            uncond, upooled = jnp.zeros_like(cond), jnp.zeros_like(pooled)
        context = jnp.concatenate([uncond, cond], axis=0)
        pooled = jnp.concatenate([upooled, pooled], axis=0)
        return context, pooled

    def encode_prompts_refiner(
        self, prompts: Sequence[str], negative_prompt: str = ""
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """SDXL-refiner single-tower encode: context = bigG penultimate
        (1280-wide, matching SDXL_REFINER_UNET.cross_attention_dim), pooled
        from the same tower. The reference builds the refiner with
        force_zeros_for_empty_prompt=False (p2p/edit_real.py:80-88), so the
        unconditional half is the *encoded* empty prompt, not zeros."""
        p = len(prompts)
        tok = self.tokenizer_2 or self.tokenizer
        ids = self._token_ids(list(prompts) + [negative_prompt] * p, tok)
        out = self._text_forward(ids, second=self.text_encoder_2 is not None)
        ctx, pooled = out["penultimate"], out["pooled"]
        context = jnp.concatenate([ctx[p:], ctx[:p]], axis=0)  # [uncond, cond]
        pooled = jnp.concatenate([pooled[p:], pooled[:p]], axis=0)
        return context, pooled

    def encode_prompts(self, prompts: Sequence[str], negative_prompt: str = ""):
        """Returns (context, added_cond or None) for self.model_type.

        ``negative_prompt`` replaces the empty-string unconditional (the
        reference's MasaCtrl ``neg_prompt`` option,
        masactrl/model/sd_utils.py:73-77)."""
        if self.model_type == "xl":
            if self.is_refiner:
                context, pooled = self.encode_prompts_refiner(
                    prompts, negative_prompt
                )
            else:
                context, pooled = self.encode_prompts_xl(prompts, negative_prompt)
            return context, {"text_embeds": pooled}
        return self.encode_prompts_sd(prompts, negative_prompt), None

    def add_time_ids(
        self, height: int, width: int, batch: int, aesthetic_score: float = 6.0
    ) -> jnp.ndarray:
        """SDXL addition time ids. Base: (orig_h, orig_w, crop_t, crop_l,
        target_h, target_w) (reference: model._get_add_time_ids call,
        p2p/inversion/ddim.py:66-76). Refiner: (orig_h, orig_w, crop_t,
        crop_l, aesthetic_score) — 5 ids x 256 dims + 1280 pooled = the 2560
        projection input of SDXL_REFINER_UNET."""
        if self.is_refiner:
            ids = jnp.asarray(
                [[height, width, 0, 0, aesthetic_score]], dtype=jnp.float32
            )
        else:
            ids = jnp.asarray(
                [[height, width, 0, 0, height, width]], dtype=jnp.float32
            )
        return jnp.broadcast_to(ids, (batch, ids.shape[-1]))

    # ----------------------------------------------------------------- image

    def image2latent(self, image: np.ndarray) -> jnp.ndarray:
        """uint8 HWC (or BHWC) image -> scaled latent mean
        (p2p/inversion/ddim.py:35-41)."""
        if image.ndim == 3:
            image = image[None]

        def encode(p, img):
            x = img.astype(self.dtype) / 127.5 - 1.0
            return self.vae.apply(p, x, method=AutoencoderKL.encode)

        return self._jitted("vae_encode", encode)(
            self.vae_params, jnp.asarray(image)
        )

    def latent2image(
        self, latents: jnp.ndarray, tile_latent: Optional[int] = None
    ) -> np.ndarray:
        """Latents -> uint8 numpy images (p2p/model/sd_utils.py:82-88).

        ``tile_latent`` decodes in overlapping latent tiles of that size
        (models/vae.py:decode_tiled) — bounds decoder activation memory for
        XL-and-beyond resolutions. Defaults to the pipeline's
        ``decode_tile_latent`` when unset."""
        def to_uint8(img):
            img = jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
            return jnp.round(img * 255).astype(jnp.uint8)

        if tile_latent is None:
            tile_latent = self.decode_tile_latent
        if tile_latent is not None:
            from image_editing_framework_tpu.models.vae import decode_tiled

            img = decode_tiled(self.vae, self.vae_params, latents, tile_latent)
            return np.asarray(to_uint8(img))

        def decode(p, z):
            return to_uint8(
                self.vae.apply(p, z, method=AutoencoderKL.decode)
            )

        return np.asarray(self._jitted("vae_decode", decode)(self.vae_params, latents))

    # ------------------------------------------------------------------ unet

    def unet_apply(self, latents, t, context, ctrl=None, added_cond=None,
                   use_flash: bool = True):
        return self.unet.apply(
            self.unet_params, latents, t, context, ctrl, added_cond, use_flash
        )


def random_pipeline(
    sd_version: str = "1.5",
    num_steps: int = 50,
    dtype: Any = jnp.bfloat16,
    seed: int = 0,
):
    """Production-SHAPE pipeline with deterministic random weights.

    Same architectures the registry loads (SD1.5/2.1 UNet+CLIP-L/H, SDXL
    UNet+CLIP-L+bigG, full VAE) but weights from ``fast_random_params``
    (realistic=True: norm scales centered at 1 so the network is live) —
    identical compute cost to trained checkpoints. This is the on-chip
    golden-hash anchor until real weights exist: a kernel or model change
    that alters outputs flips the committed validation hashes
    (the reference's committed exp/*.png serve this role,
    p2p/edit_real.py:173-174).

    Params are STORED in ``dtype`` (param_dtype=dtype), matching how the
    registry loads production checkpoints (bf16); without the override,
    flax's f32 default leaves put XL at ~14 GB of params — over a 16 GB
    chip before the first activation."""
    from image_editing_framework_tpu.models import configs
    from image_editing_framework_tpu.models.clip import (
        CLIP_VIT_L,
        OPEN_CLIP_BIG_G,
        OPEN_CLIP_VIT_H,
        CLIPTextModel,
    )
    from image_editing_framework_tpu.models.init_utils import fast_random_params
    from image_editing_framework_tpu.models.tokenizer import WordTokenizer
    from image_editing_framework_tpu.models.vae import VAEConfig

    is_refiner = sd_version == "xl-refiner"
    is_xl = sd_version.startswith("xl")
    is_21 = sd_version.startswith("2")
    unet_cfg = (
        configs.SDXL_REFINER_UNET if is_refiner
        else configs.SDXL_UNET if is_xl else configs.SD21_UNET if is_21
        else configs.SD15_UNET
    )
    unet = UNet2DCondition(unet_cfg, dtype=dtype)
    ctx_dim = unet_cfg.cross_attention_dim
    # init at tiny spatial shapes: conv/attn param shapes are spatial-
    # independent, and eval_shape at 16x16 is instant
    lat = jnp.zeros((1, 16, 16, 4), dtype)
    ctx = jnp.zeros((1, 77, ctx_dim), dtype)
    added = (
        {
            "text_embeds": jnp.zeros((1, 1280), dtype),
            "time_ids": jnp.zeros((1, 5 if is_refiner else 6), dtype),
        }
        if is_xl
        else None
    )
    unet_params = fast_random_params(
        unet, lat, 0, ctx, None, added, False, seed=seed, realistic=True,
        param_dtype=dtype,
    )

    vae = AutoencoderKL(VAEConfig(), dtype=dtype)
    vae_params = fast_random_params(
        vae, jnp.zeros((1, 64, 64, 3), dtype), seed=seed + 1, realistic=True,
        param_dtype=dtype,
    )

    tokenizer = WordTokenizer(vocab_size=49408)
    ids = jnp.zeros((1, 77), jnp.int32)
    if is_refiner:
        # Single bigG tower carries the full 1280-wide context AND the pooled
        # embed (reference: the refiner's text_encoder_2-only pipeline,
        # p2p/edit_real.py:77-89); there is no CLIP-L tower on the refiner.
        text2 = CLIPTextModel(OPEN_CLIP_BIG_G, dtype=dtype)
        text2_params = fast_random_params(
            text2, ids, seed=seed + 3, realistic=True, param_dtype=dtype
        )
        pipe = SDPipeline(
            model_type="xl",
            unet=unet,
            unet_params=unet_params,
            vae=vae,
            vae_params=vae_params,
            text_encoder=text2,
            text_params=text2_params,
            tokenizer=tokenizer,
            scheduler=make_ddim_schedule(num_steps),
            text_encoder_2=text2,
            text_params_2=text2_params,
            tokenizer_2=tokenizer,
            dtype=dtype,
            is_refiner=True,
        )
        return pipe
    if is_xl:
        text = CLIPTextModel(CLIP_VIT_L, dtype=dtype)
        text2 = CLIPTextModel(OPEN_CLIP_BIG_G, dtype=dtype)
        pipe = SDPipeline(
            model_type="xl",
            unet=unet,
            unet_params=unet_params,
            vae=vae,
            vae_params=vae_params,
            text_encoder=text,
            text_params=fast_random_params(text, ids, seed=seed + 2, realistic=True, param_dtype=dtype),
            tokenizer=tokenizer,
            scheduler=make_ddim_schedule(num_steps),
            text_encoder_2=text2,
            text_params_2=fast_random_params(text2, ids, seed=seed + 3, realistic=True, param_dtype=dtype),
            tokenizer_2=tokenizer,
            dtype=dtype,
        )
        return pipe
    text = CLIPTextModel(OPEN_CLIP_VIT_H if is_21 else CLIP_VIT_L, dtype=dtype)
    return SDPipeline(
        model_type="sd",
        unet=unet,
        unet_params=unet_params,
        vae=vae,
        vae_params=vae_params,
        text_encoder=text,
        text_params=fast_random_params(text, ids, seed=seed + 2, realistic=True, param_dtype=dtype),
        tokenizer=tokenizer,
        scheduler=make_ddim_schedule(num_steps),
        dtype=dtype,
    )


def tiny_pipeline(
    num_steps: int = 50,
    model_type: str = "sd",
    seed: int = 0,
    dtype: Any = jnp.float32,
):
    """Random-weight tiny pipeline for tests (the reference's validation
    strategy offers no fixtures — SURVEY.md §4 — so we build our own).

    model_type: 'sd', 'xl', or 'xl-refiner' (single bigG-style tower,
    5 time ids, is_refiner=True). ``dtype`` sets the compute dtype of every
    model AND casts params — ``jnp.bfloat16`` mirrors the production loader
    (registry.load_pipeline(dtype=...)) for dtype-robustness tests."""
    from image_editing_framework_tpu.models import configs
    from image_editing_framework_tpu.models.clip import TINY_CLIP, CLIPTextModel
    from image_editing_framework_tpu.models.tokenizer import WordTokenizer
    from image_editing_framework_tpu.models.vae import TINY_VAE

    rng = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    is_refiner = model_type == "xl-refiner"
    is_xl = model_type == "xl" or is_refiner
    unet_cfg = (
        configs.TINY_REFINER_UNET
        if is_refiner
        else configs.TINY_XL_UNET if is_xl else configs.TINY_UNET
    )
    unet = UNet2DCondition(unet_cfg, dtype=dtype)
    x = jnp.zeros((1, 16, 16, 4))
    ctx_dim = unet_cfg.cross_attention_dim
    ctx = jnp.zeros((1, 77, ctx_dim))
    added = (
        {
            "text_embeds": jnp.zeros((1, 16)),
            "time_ids": jnp.zeros((1, 5 if is_refiner else 6)),
        }
        if is_xl
        else None
    )
    # use_flash=False: param init never needs the kernel, and this fixture
    # must build on virtual CPU meshes even when the default backend is TPU.
    unet_params = unet.init(k1, x, 0, ctx, None, added, False)

    vae = AutoencoderKL(TINY_VAE, dtype=dtype)
    vae_params = vae.init(k2, jnp.zeros((1, 32, 32, 3)))

    # XL base: the context is the concat of both encoders' penultimate
    # states, so each tiny tower gets half the cross-attention width.
    # Refiner: one bigG-style tower carries the full width.
    hid = ctx_dim if is_refiner or not is_xl else ctx_dim // 2
    tokenizer = WordTokenizer(vocab_size=64)
    clip_cfg = dataclasses.replace(
        TINY_CLIP,
        hidden_size=hid,
        projection_dim=16 if is_refiner else None,
        vocab_size=64,
    )
    text = CLIPTextModel(clip_cfg, dtype=dtype)
    text_params = text.init(k3, jnp.zeros((1, 77), jnp.int32))

    pipe = SDPipeline(
        model_type="xl" if is_xl else model_type,
        unet=unet,
        unet_params=unet_params,
        vae=vae,
        vae_params=vae_params,
        text_encoder=text,
        text_params=text_params,
        tokenizer=tokenizer,
        scheduler=make_ddim_schedule(num_steps),
        dtype=dtype,
        is_refiner=is_refiner,
    )
    if is_refiner:
        # the single tower serves as text_encoder_2 (bigG role)
        pipe.text_encoder_2 = text
        pipe.text_params_2 = text_params
        pipe.tokenizer_2 = tokenizer
    elif is_xl:
        clip2 = dataclasses.replace(
            TINY_CLIP, hidden_size=hid, projection_dim=16, vocab_size=64
        )
        text2 = CLIPTextModel(clip2, dtype=dtype)
        pipe.text_encoder_2 = text2
        pipe.text_params_2 = text2.init(k4, jnp.zeros((1, 77), jnp.int32))
        pipe.tokenizer_2 = tokenizer
    if dtype != jnp.float32:
        cast = lambda t: jax.tree.map(
            lambda a: a.astype(dtype)
            if jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            t,
        )
        pipe.unet_params = cast(pipe.unet_params)
        pipe.vae_params = cast(pipe.vae_params)
        pipe.text_params = cast(pipe.text_params)
        if pipe.text_params_2 is not None:
            pipe.text_params_2 = cast(pipe.text_params_2)
    return pipe
