"""CLIP vision tower parity vs transformers (PyTorch, random weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_editing_framework_tpu.models import loader
from image_editing_framework_tpu.models.clip import (
    TINY_CLIP_VISION,
    CLIPVisionModel,
    clip_preprocess,
)
from image_editing_framework_tpu.eval import metrics


def test_vision_shapes():
    m = CLIPVisionModel(TINY_CLIP_VISION)
    px = jnp.zeros((2, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), px)
    out = m.apply(params, px)
    assert out["pooled"].shape == (2, 32)
    assert out["image_embeds"].shape == (2, 32)


@pytest.mark.slow
def test_vision_parity_vs_transformers():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection

    hf_cfg = HFConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        image_size=32,
        patch_size=16,
        projection_dim=32,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPVisionModelWithProjection(hf_cfg).eval()
    ckpt = {k: v.numpy() for k, v in hf.state_dict().items()}

    m = CLIPVisionModel(TINY_CLIP_VISION)
    px_np = np.random.RandomState(0).randn(1, 32, 32, 3).astype(np.float32)
    skeleton = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    )
    params = loader.load_params(skeleton, ckpt, loader.clip_vision_key)
    out = m.apply(params, jnp.asarray(px_np))

    with torch.no_grad():
        hf_out = hf(pixel_values=torch.tensor(px_np.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(out["image_embeds"]), hf_out.image_embeds.numpy(), atol=3e-5
    )


def test_clip_preprocess_shapes():
    imgs = jnp.zeros((2, 512, 512, 3), jnp.uint8)
    out = clip_preprocess(imgs, 224)
    assert out.shape == (2, 224, 224, 3)


def test_structure_metrics():
    a = np.zeros((8, 8, 3), np.uint8)
    b = np.full((8, 8, 3), 255, np.uint8)
    assert metrics.mse(a, a) == 0.0
    assert metrics.psnr(a, a) == float("inf")
    assert metrics.mse(a, b) == pytest.approx(1.0)
    assert metrics.ssim(a, a) == pytest.approx(1.0, abs=1e-5)
    assert metrics.ssim(a, b) < 0.1
    # SSIM is bounded by 1 — regression: TPU's default bf16 conv accumulation
    # destroyed the avg(x^2)-mu^2 cancellation and reported SSIM > 1 for
    # natural image pairs (caught by the on-chip golden report)
    rng = np.random.RandomState(0)
    x = rng.randint(0, 255, (64, 64, 3), np.uint8)
    noisy = np.clip(
        x.astype(np.int32) + rng.randint(-20, 20, x.shape), 0, 255
    ).astype(np.uint8)
    s = metrics.ssim(x, noisy)
    assert 0.0 < s <= 1.0 + 1e-5
