"""Pipeline assembly from checkpoints — the ``from_pretrained`` equivalent.

Replicates the reference's 6-way loader (p2p/edit_real.py:71-98) keyed by
``--sd_version`` through ``sd_mapping.sd_maps``, entirely offline: weights are
read from local HF-snapshot-layout directories via the safetensors mapper.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp

from image_editing_framework_tpu import sd_mapping
from image_editing_framework_tpu.core.scheduler import make_ddim_schedule
from image_editing_framework_tpu.models import configs, loader
from image_editing_framework_tpu.models.clip import (
    CLIP_VIT_L,
    OPEN_CLIP_BIG_G,
    OPEN_CLIP_VIT_H,
    CLIPTextConfig,
    CLIPTextModel,
)
from image_editing_framework_tpu.models.tokenizer import CLIPTokenizer
from image_editing_framework_tpu.models.unet import UNet2DCondition, UNetConfig
from image_editing_framework_tpu.models.vae import AutoencoderKL, VAEConfig
from image_editing_framework_tpu.pipelines import SDPipeline


@dataclasses.dataclass(frozen=True)
class VersionSpec:
    model_type: str  # 'sd' | 'xl'
    unet: UNetConfig
    text: CLIPTextConfig
    text_2: Optional[CLIPTextConfig] = None
    vae_scaling: float = configs.SD_VAE_SCALING
    sample_size: int = 512
    # Full VAE architecture override (tests inject tiny configs); None means
    # the standard SD VAE at this version's scaling factor.
    vae: Optional[VAEConfig] = None

    @property
    def vae_config(self) -> VAEConfig:
        return self.vae or VAEConfig(scaling_factor=self.vae_scaling)


VERSION_SPECS = {
    "1.4": VersionSpec("sd", configs.SD15_UNET, CLIP_VIT_L),
    "1.5": VersionSpec("sd", configs.SD15_UNET, CLIP_VIT_L),
    "2.1": VersionSpec("sd", configs.SD21_UNET, OPEN_CLIP_VIT_H, sample_size=768),
    "xl-base": VersionSpec(
        "xl", configs.SDXL_UNET, CLIP_VIT_L, OPEN_CLIP_BIG_G,
        vae_scaling=configs.SDXL_VAE_SCALING, sample_size=1024,
    ),
    # 'xl-refiner' = an XL-*base* editing pipeline with the refiner img2img
    # pipeline attached (reference: p2p/edit_real.py:77-89 loads the XL
    # pipeline from sd_maps[version] and the refiner from refiner_key,
    # sharing text_encoder_2/vae). The refiner itself uses REFINER_SPEC.
    "xl-refiner": VersionSpec(
        "xl", configs.SDXL_UNET, CLIP_VIT_L, OPEN_CLIP_BIG_G,
        vae_scaling=configs.SDXL_VAE_SCALING, sample_size=1024,
    ),
    # single-file community checkpoints reuse the base architectures
    "animagineXL": VersionSpec(
        "xl", configs.SDXL_UNET, CLIP_VIT_L, OPEN_CLIP_BIG_G,
        vae_scaling=configs.SDXL_VAE_SCALING, sample_size=1024,
    ),
    "ghostv2": VersionSpec("sd", configs.SD15_UNET, CLIP_VIT_L),
    "cf": VersionSpec("sd", configs.SD15_UNET, CLIP_VIT_L),
    "anythingv4-5": VersionSpec("sd", configs.SD15_UNET, CLIP_VIT_L),
}

# The refiner's own architecture: bigG tower only (the ``text`` field holds
# the single tower's config), 1280-wide cross-attention, 5 addition time ids.
REFINER_SPEC = VersionSpec(
    "xl", configs.SDXL_REFINER_UNET, OPEN_CLIP_BIG_G,
    vae_scaling=configs.SDXL_VAE_SCALING, sample_size=1024,
)


def _weights(directory: str, sub: str, base: str = "diffusion_pytorch_model"):
    d = os.path.join(directory, sub)
    for candidate in (base, base + ".fp16"):
        p = os.path.join(d, candidate + ".safetensors")
        if os.path.exists(p):
            return loader.load_safetensors(p)
    return loader.load_sharded_safetensors(d, base)


def _tokenizer2_dir(tok_dir: str, root: str, single_file: bool) -> str:
    """XL second-tower tokenizer directory for a resolved first-tower
    ``tok_dir``. For single-file checkpoints, swap only the TRAILING
    directory name (str.replace would also rewrite a "tokenizer" substring
    elsewhere in the path, e.g. /ckpts/tokenizer-lab/tokenizer) and fall
    back to the first tower's files when no tokenizer_2/ exists (the two
    towers share the BPE vocab in most community single-file layouts)."""
    if single_file:
        tok2 = os.path.join(os.path.dirname(tok_dir), "tokenizer_2")
        return tok2 if os.path.isdir(tok2) else tok_dir
    return os.path.join(root, "tokenizer_2")


def _skeleton(module, *args, **kwargs):
    return jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs))


def _added_cond_skeleton(unet_cfg, dtype, n_time_ids: int = 6):
    """Shape-only SDXL added-cond dict: pooled width follows from the
    projection input minus the time-id embeddings (base 6 ids, refiner 5)."""
    pooled = (
        unet_cfg.projection_class_embeddings_input_dim
        - n_time_ids * unet_cfg.addition_time_embed_dim
    )
    return {
        "text_embeds": jnp.zeros((1, pooled), dtype),
        "time_ids": jnp.zeros((1, n_time_ids), dtype),
    }


# ---------------------------------------------------------------------------
# orbax param cache: skip safetensors conversion on repeat loads


def save_pipeline_cache(pipe, cache_dir: str) -> None:
    """Persist a loaded pipeline's param trees with orbax (async-safe,
    chunked, mmap-restorable) so later loads skip key mapping entirely."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    trees = {
        "unet": pipe.unet_params,
        "vae": pipe.vae_params,
        "text": pipe.text_params,
    }
    if pipe.text_params_2 is not None:
        trees["text2"] = pipe.text_params_2
    for name, tree in trees.items():
        ckptr.save(os.path.join(os.path.abspath(cache_dir), name), tree)
    ckptr.wait_until_finished()


def restore_pipeline_cache(pipe, cache_dir: str):
    """Restore param trees saved by save_pipeline_cache into ``pipe``."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    root = os.path.abspath(cache_dir)
    pipe.unet_params = ckptr.restore(os.path.join(root, "unet"), pipe.unet_params)
    pipe.vae_params = ckptr.restore(os.path.join(root, "vae"), pipe.vae_params)
    pipe.text_params = ckptr.restore(os.path.join(root, "text"), pipe.text_params)
    if pipe.text_params_2 is not None and os.path.isdir(os.path.join(root, "text2")):
        pipe.text_params_2 = ckptr.restore(
            os.path.join(root, "text2"), pipe.text_params_2
        )
    return pipe


def load_pipeline(
    sd_version: str,
    num_inference_steps: int = 50,
    dtype=jnp.float32,
    path: Optional[str] = None,
    spec: Optional[VersionSpec] = None,
    refiner_path: Optional[str] = None,
    refiner_spec: Optional[VersionSpec] = None,
) -> SDPipeline:
    """Build a fully-loaded SDPipeline for a registry version.

    ``path`` overrides ``sd_mapping.sd_maps[sd_version]``. Both HF-snapshot
    directory layouts and single-file ``.safetensors`` checkpoints (incl. XL
    and SD2.x LDM key layouts, via models/convert_ldm.py) are supported.

    ``sd_version='xl-refiner'`` loads the XL-base editing pipeline and
    attaches the refiner img2img pipeline as ``pipe.refiner``, sharing
    text_encoder_2/vae with the base (reference: p2p/edit_real.py:77-89).
    ``spec``/``refiner_spec`` override the architecture presets (tests inject
    tiny configs through the full loader path).
    """
    if sd_version not in VERSION_SPECS:
        raise ValueError(f"please use the right sd_version (got {sd_version!r})")
    spec = spec or VERSION_SPECS[sd_version]
    root = path or sd_mapping.sd_maps[sd_version]
    single_file = root.endswith(".safetensors")
    text2_ckpt = None
    if single_file:
        # tokenizer files must sit next to the single file or in the base
        # registry entry for the family; fail BEFORE the (expensive) LDM
        # conversion with both tried paths rather than later with a
        # confusing tokenizer-file error (a user with only a community
        # .safetensors commonly has neither)
        base = "xl-base" if spec.model_type == "xl" else "1.5"
        local_tok = os.path.join(os.path.dirname(root), "tokenizer")
        base_tok = os.path.join(sd_mapping.sd_maps[base], "tokenizer")
        tok_dir = local_tok if os.path.isdir(local_tok) else base_tok
        if not os.path.isdir(tok_dir):
            raise FileNotFoundError(
                f"no tokenizer files for single-file checkpoint {root}: "
                f"looked for {local_tok} (next to the checkpoint) and "
                f"{base_tok} (the {base!r} base entry). Either place a "
                f"tokenizer/ directory (vocab.json + merges.txt) next to the "
                f".safetensors file, or point sd_maps[{base!r}] in "
                f"sd_mapping.py at a full {base} checkpoint directory."
            )

        from image_editing_framework_tpu.models import convert_ldm

        vae_cfg_tmp = spec.vae_config
        if spec.model_type == "xl":
            unet_ckpt, vae_ckpt, text_ckpt, text2_ckpt = (
                convert_ldm.convert_single_file_xl(root, spec.unet, vae_cfg_tmp)
            )
        else:
            unet_ckpt, vae_ckpt, text_ckpt = convert_ldm.convert_single_file(
                root, spec.unet, vae_cfg_tmp
            )

    is_xl = spec.model_type == "xl"
    unet = UNet2DCondition(spec.unet, dtype=dtype)
    x = jnp.zeros((1, spec.sample_size // 8, spec.sample_size // 8, 4), dtype)
    ctx = jnp.zeros((1, 77, spec.unet.cross_attention_dim), dtype)
    added = _added_cond_skeleton(spec.unet, dtype) if is_xl else None
    unet_params = loader.load_params(
        _skeleton(unet, x, 0, ctx, None, added),
        unet_ckpt if single_file else _weights(root, "unet"),
        loader.unet_key,
        dtype,
    )

    vae_cfg = spec.vae_config
    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    vae_params = loader.load_params(
        _skeleton(vae, jnp.zeros((1, 64, 64, 3), dtype)),
        vae_ckpt if single_file else _weights(root, "vae"),
        loader.vae_key,
        dtype,
    )

    text = CLIPTextModel(spec.text, dtype=dtype)
    ids = jnp.zeros((1, 77), jnp.int32)
    text_params = loader.load_params(
        _skeleton(text, ids),
        text_ckpt if single_file else _weights(root, "text_encoder", "model"),
        loader.clip_key,
        dtype,
    )
    tokenizer = CLIPTokenizer.from_dir(
        tok_dir if single_file else os.path.join(root, "tokenizer")
    )

    pipe = SDPipeline(
        model_type=spec.model_type,
        unet=unet,
        unet_params=unet_params,
        vae=vae,
        vae_params=vae_params,
        text_encoder=text,
        text_params=text_params,
        tokenizer=tokenizer,
        scheduler=make_ddim_schedule(num_inference_steps),
        dtype=dtype,
    )
    if is_xl:
        text2 = CLIPTextModel(spec.text_2, dtype=dtype)
        pipe.text_encoder_2 = text2
        pipe.text_params_2 = loader.load_params(
            _skeleton(text2, ids),
            text2_ckpt if single_file else _weights(root, "text_encoder_2", "model"),
            loader.clip_key,
            dtype,
        )
        pipe.tokenizer_2 = CLIPTokenizer.from_dir(
            _tokenizer2_dir(tok_dir, root, single_file)
        )
    if sd_version == "xl-refiner":
        pipe.refiner = load_refiner_pipeline(
            path=refiner_path,
            base=pipe,
            num_inference_steps=num_inference_steps,
            dtype=dtype,
            spec=refiner_spec,
        )
    return pipe


def load_refiner_pipeline(
    path: Optional[str] = None,
    base: Optional[SDPipeline] = None,
    num_inference_steps: int = 50,
    dtype=jnp.float32,
    spec: Optional[VersionSpec] = None,
) -> SDPipeline:
    """Load the SDXL refiner img2img pipeline (SDXL_REFINER_UNET: bigG tower
    only, 1280-wide context, 5 addition time ids with aesthetic_score).

    When ``base`` is given, text_encoder_2 / vae / tokenizer_2 / scheduler are
    *shared* with it — the reference's
    ``StableDiffusionXLImg2ImgPipeline.from_pretrained(refiner_key,
    text_encoder_2=pipe.text_encoder_2, vae=pipe.vae)``
    (p2p/edit_real.py:80-88). Standalone loads read them from the refiner
    checkpoint directory (which ships text_encoder_2/ and vae/ but no
    text_encoder/).
    """
    spec = spec or REFINER_SPEC
    root = path or sd_mapping.refiner_key

    unet = UNet2DCondition(spec.unet, dtype=dtype)
    x = jnp.zeros((1, spec.sample_size // 8, spec.sample_size // 8, 4), dtype)
    ctx = jnp.zeros((1, 77, spec.unet.cross_attention_dim), dtype)
    added = _added_cond_skeleton(spec.unet, dtype, n_time_ids=5)
    unet_params = loader.load_params(
        _skeleton(unet, x, 0, ctx, None, added),
        _weights(root, "unet"),
        loader.unet_key,
        dtype,
    )

    if base is not None:
        vae, vae_params = base.vae, base.vae_params
        text2, text2_params = base.text_encoder_2, base.text_params_2
        tok2 = base.tokenizer_2
        scheduler = base.scheduler
    else:
        vae = AutoencoderKL(spec.vae_config, dtype=dtype)
        vae_params = loader.load_params(
            _skeleton(vae, jnp.zeros((1, 64, 64, 3), dtype)),
            _weights(root, "vae"),
            loader.vae_key,
            dtype,
        )
        text2 = CLIPTextModel(spec.text, dtype=dtype)
        text2_params = loader.load_params(
            _skeleton(text2, jnp.zeros((1, 77), jnp.int32)),
            _weights(root, "text_encoder_2", "model"),
            loader.clip_key,
            dtype,
        )
        tok2 = CLIPTokenizer.from_dir(os.path.join(root, "tokenizer_2"))
        scheduler = make_ddim_schedule(num_inference_steps)

    return SDPipeline(
        model_type="xl",
        unet=unet,
        unet_params=unet_params,
        vae=vae,
        vae_params=vae_params,
        text_encoder=text2,
        text_params=text2_params,
        tokenizer=tok2,
        scheduler=scheduler,
        text_encoder_2=text2,
        text_params_2=text2_params,
        tokenizer_2=tok2,
        dtype=dtype,
        is_refiner=True,
    )
