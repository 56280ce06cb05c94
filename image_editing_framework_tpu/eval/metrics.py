"""Evaluation metrics for edit quality.

The reference computes NO metrics (torchmetrics is listed in its
requirements.txt:9 but never imported — SURVEY.md §4); PIE-Bench evaluation
is visual. This module supplies the quantitative layer the BASELINE targets
require:

* structure metrics (MSE / PSNR / SSIM) — pure jnp, always available;
* CLIP score (image-text alignment) — needs a CLIP vision tower checkpoint;
* LPIPS — needs pretrained VGG/AlexNet features; offline environments
  without those weights get a clear error, not a silent fallback.
"""

from __future__ import annotations

from typing import Optional

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
        a, b = a[None], b[None]

    def avg(x):
        k = jnp.ones((window, window, 1, 1), x.dtype) / (window * window)
        return jax.lax.conv_general_dilated(
            x.transpose(0, 3, 1, 2),
            jnp.broadcast_to(k.transpose(3, 2, 0, 1), (x.shape[3], 1, window, window)),
            (1, 1),
            "VALID",
            feature_group_count=x.shape[3],
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
    """CLIP image-text alignment score.

    Requires a CLIP checkpoint with a vision tower (e.g. ViT-B/32) converted
    to Flax; pass its directory. Raises if unavailable — this framework never
    fakes metric numbers.
    """

    def __init__(self, checkpoint_dir: Optional[str] = None):
        if checkpoint_dir is None:
            raise NotImplementedError(
                "CLIPScore needs a local CLIP vision checkpoint; the Flax "
                "vision tower lands alongside the text towers in a follow-up "
                "round (models/clip.py currently implements text only)."
            )
        raise NotImplementedError("vision tower loading not yet wired")


class LPIPS:
    """Learned perceptual similarity; needs pretrained feature weights."""

    def __init__(self, checkpoint_path: Optional[str] = None):
        raise NotImplementedError(
            "LPIPS requires pretrained VGG/AlexNet features; unavailable "
            "offline. Planned: torchvision-format weight conversion."
        )
