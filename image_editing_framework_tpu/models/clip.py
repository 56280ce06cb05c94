"""Flax CLIP text encoders (OpenAI CLIP ViT-L/14, OpenCLIP ViT-H / bigG).

The reference gets these from transformers via the diffusers pipelines
(encode at p2p/model/sd_utils.py:42-55; XL dual-encoder via
model.encode_prompt at p2p/model/sd_utils.py:189-222). Output conventions:

* SD1.x:  last hidden state after the final LayerNorm (CLIP-L, quick_gelu).
* SD2.1:  checkpoint ships a 23-layer truncation of OpenCLIP-H (gelu) with
          the final LayerNorm applied — same code path, different config.
* SDXL:   CLIP-L penultimate hidden state (no final LN) concat
          OpenCLIP-bigG penultimate hidden state, plus bigG's *pooled*
          embedding (final LN at the EOS position @ text_projection).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_length: int = 77
    hidden_act: str = "quick_gelu"  # "quick_gelu" (OpenAI) | "gelu" (OpenCLIP)
    # projection to the pooled text embedding (SDXL's text_encoder_2)
    projection_dim: Optional[int] = None


CLIP_VIT_L = CLIPTextConfig()  # SD1.x / SDXL text_encoder
OPEN_CLIP_VIT_H = CLIPTextConfig(
    hidden_size=1024, num_layers=23, num_heads=16, intermediate_size=4096,
    hidden_act="gelu",
)  # SD2.1
OPEN_CLIP_BIG_G = CLIPTextConfig(
    hidden_size=1280, num_layers=32, num_heads=20, intermediate_size=5120,
    hidden_act="gelu", projection_dim=1280,
)  # SDXL text_encoder_2

TINY_CLIP = CLIPTextConfig(
    vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
    intermediate_size=64, projection_dim=32,
)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return lambda x: nn.gelu(x, approximate=False)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        d = cfg.hidden_size // cfg.num_heads
        q = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="v_proj")(x)
        b, n, _ = x.shape
        q = q.reshape(b, n, cfg.num_heads, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, cfg.num_heads, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, cfg.num_heads, d).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / math.sqrt(d)
        s = jnp.where(causal_mask, s, jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out_proj")(out)


class CLIPLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(cfg, dtype=self.dtype, name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    image_size: int = 224
    patch_size: int = 32
    hidden_act: str = "quick_gelu"
    projection_dim: int = 512


CLIP_VIT_B32_VISION = CLIPVisionConfig()  # the standard CLIP-score backbone

TINY_CLIP_VISION = CLIPVisionConfig(
    hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
    image_size=32, patch_size=16, projection_dim=32,
)

# CLIP image preprocessing constants (OpenAI).
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


class CLIPVisionModel(nn.Module):
    """CLIP ViT vision tower with projection (for the CLIP-score metric —
    the reference computes no metrics at all, SURVEY.md §4)."""

    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray):
        """pixel_values: (B, H, W, 3), CLIP-normalized.

        Returns dict with 'pooled' (B, hidden) post-LN class embedding and
        'image_embeds' (B, projection_dim).
        """
        cfg = self.config
        b = pixel_values.shape[0]
        # patch embedding: conv stride=patch, no bias (transformers parity)
        x = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(pixel_values)
        x = x.reshape(b, -1, cfg.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None], (b, 1, cfg.hidden_size)), x], axis=1
        )
        n = x.shape[1]
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            ((cfg.image_size // cfg.patch_size) ** 2 + 1, cfg.hidden_size),
        )
        x = x + pos[None, :n].astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_layrnorm")(x)
        mask = jnp.ones((n, n), bool)[None, None]
        text_like = CLIPTextConfig(
            hidden_size=cfg.hidden_size,
            num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            intermediate_size=cfg.intermediate_size,
            hidden_act=cfg.hidden_act,
        )
        for i in range(cfg.num_layers):
            x = CLIPLayer(text_like, dtype=self.dtype, name=f"layer_{i}")(x, mask)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="post_layernorm")(
            x[:, 0]
        )
        embeds = nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=self.dtype,
            name="visual_projection",
        )(pooled)
        return {"pooled": pooled, "image_embeds": embeds}


def clip_preprocess(images: jnp.ndarray, image_size: int = 224) -> jnp.ndarray:
    """uint8 (B,H,W,3) -> CLIP-normalized (B,image_size,image_size,3).

    Bicubic resize + center normalization (matches CLIPImageProcessor's
    defaults closely enough for scoring; exact antialiased resize parity is
    not required for relative comparisons)."""
    import jax

    x = images.astype(jnp.float32) / 255.0
    x = jax.image.resize(
        x, (x.shape[0], image_size, image_size, 3), method="bicubic"
    )
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    return (x - mean) / std


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray):
        """input_ids: (B, 77) int32.

        Returns dict with:
          last_hidden_state: (B, 77, D) after the final LayerNorm,
          penultimate:       (B, 77, D) hidden_states[-2] (pre final LN),
          pooled:            (B, D_proj) EOS-position embedding (projected if
                             projection_dim is set).
        """
        cfg = self.config
        b, n = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_embedding")(
            input_ids
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_length, cfg.hidden_size),
        )
        x = tok + pos[None, :n].astype(self.dtype)
        causal = jnp.tril(jnp.ones((n, n), bool))[None, None]
        penultimate = None
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1:
                penultimate = x
            x = CLIPLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(x, causal)
        last = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(x)
        # Pooled: embedding at the EOS token — CLIP takes argmax(ids) since
        # EOS has the highest token id.
        eos_pos = jnp.argmax(input_ids, axis=-1)
        pooled = last[jnp.arange(b), eos_pos]
        if cfg.projection_dim is not None:
            pooled = nn.Dense(
                cfg.projection_dim, use_bias=False, dtype=self.dtype,
                name="text_projection",
            )(pooled)
        return {
            "last_hidden_state": last,
            "penultimate": penultimate,
            "pooled": pooled,
        }
