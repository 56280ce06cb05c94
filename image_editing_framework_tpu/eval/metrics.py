"""Evaluation metrics for edit quality.

The reference computes NO metrics (torchmetrics is listed in its
requirements.txt:9 but never imported — SURVEY.md §4); PIE-Bench evaluation
is visual. This module supplies the quantitative layer the BASELINE targets
require:

* structure metrics (MSE / PSNR / SSIM) — pure jnp, always available;
* CLIP score (image-text alignment) — needs a CLIP vision tower checkpoint;
* LPIPS — implemented in eval/lpips.py (VGG16 features with torchvision
  -format weight conversion).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def _to_float(img: np.ndarray) -> jnp.ndarray:
    x = jnp.asarray(img)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    return x


def mse(a, b) -> float:
    a, b = _to_float(a), _to_float(b)
    return float(jnp.mean((a - b) ** 2))


def psnr(a, b) -> float:
    m = mse(a, b)
    if m == 0:
        return float("inf")
    return float(10.0 * jnp.log10(1.0 / m))


def ssim(a, b, window: int = 7) -> float:
    """Mean SSIM over channels (uniform window)."""
    a, b = _to_float(a), _to_float(b)
    if a.ndim == 3:
        a = a[None]
    if b.ndim == 3:
        b = b[None]

    def avg(x):
        k = jnp.ones((window, window, 1, 1), x.dtype) / (window * window)
        return jax.lax.conv_general_dilated(
            x.transpose(0, 3, 1, 2),
            jnp.broadcast_to(k.transpose(3, 2, 0, 1), (x.shape[3], 1, window, window)),
            (1, 1),
            "VALID",
            feature_group_count=x.shape[3],
            # metrics must be exact: TPU convs default to bf16 accumulation,
            # which destroys the avg(x^2) - mu^2 cancellation (SSIM > 1)
            precision=jax.lax.Precision.HIGHEST,
        ).transpose(0, 2, 3, 1)

    c1, c2 = 0.01**2, 0.03**2
    mu_a, mu_b = avg(a), avg(b)
    var_a = avg(a * a) - mu_a**2
    var_b = avg(b * b) - mu_b**2
    cov = avg(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return float(jnp.mean(s))


class CLIPScore:
    """CLIP image-text alignment score: 100 * max(cos(img_emb, txt_emb), 0).

    Loads both towers of a full CLIP checkpoint (HF layout: a directory with
    ``model.safetensors`` holding text_model.* / vision_model.* /
    *_projection plus a ``tokenizer/`` or top-level vocab files). Raises if
    unavailable — this framework never fakes metric numbers.
    """

    def __init__(self, checkpoint_dir: str, dtype=jnp.float32):
        import os

        import jax as _jax

        from image_editing_framework_tpu.models import loader
        from image_editing_framework_tpu.models.clip import (
            CLIP_VIT_B32_VISION,
            CLIPTextConfig,
            CLIPTextModel,
            CLIPVisionModel,
            clip_preprocess,
        )
        from image_editing_framework_tpu.models.tokenizer import CLIPTokenizer

        ckpt_path = os.path.join(checkpoint_dir, "model.safetensors")
        ckpt = loader.load_safetensors(ckpt_path)

        text_cfg = CLIPTextConfig(projection_dim=CLIP_VIT_B32_VISION.projection_dim)
        self.text = CLIPTextModel(text_cfg, dtype=dtype)
        ids = jnp.zeros((1, 77), jnp.int32)
        self.text_params = loader.load_params(
            _jax.eval_shape(lambda: self.text.init(_jax.random.PRNGKey(0), ids)),
            ckpt,
            loader.clip_key,
            dtype,
        )
        self.vision = CLIPVisionModel(CLIP_VIT_B32_VISION, dtype=dtype)
        px = jnp.zeros((1, 224, 224, 3), dtype)
        self.vision_params = loader.load_params(
            _jax.eval_shape(lambda: self.vision.init(_jax.random.PRNGKey(0), px)),
            ckpt,
            loader.clip_vision_key,
            dtype,
        )
        tok_dir = checkpoint_dir
        if os.path.isdir(os.path.join(checkpoint_dir, "tokenizer")):
            tok_dir = os.path.join(checkpoint_dir, "tokenizer")
        self.tokenizer = CLIPTokenizer.from_dir(tok_dir)
        self._preprocess = clip_preprocess

    def __call__(self, images: np.ndarray, prompts) -> float:
        """images: uint8 (B, H, W, 3); prompts: list[str] of length B."""
        from image_editing_framework_tpu.models.tokenizer import pad_token_ids

        px = self._preprocess(jnp.asarray(images))
        img = self.vision.apply(self.vision_params, px)["image_embeds"]
        ids = jnp.asarray(pad_token_ids(self.tokenizer, list(prompts)))
        txt = self.text.apply(self.text_params, ids)["pooled"]
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        cos = jnp.sum(img * txt, axis=-1)
        return float(jnp.mean(100.0 * jnp.maximum(cos, 0.0)))


# LPIPS lives in eval/lpips.py (VGG16 feature network + torchvision-format
# weight conversion).
