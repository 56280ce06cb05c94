"""Flax AutoencoderKL (the SD VAE).

The reference calls diffusers' VAE at exactly two sites: encode to the latent
distribution *mean* (not a sample — p2p/inversion/ddim.py:39) and decode
(p2p/model/sd_utils.py:84). NHWC layout; GroupNorm eps 1e-6 throughout
(diffusers VAE convention).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _gn(ch: int) -> int:
    """GroupNorm group count: 32 in all real configs; clamp for tiny tests."""
    return min(32, ch)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215


TINY_VAE = VAEConfig(block_out_channels=(16, 32), layers_per_block=1)


class VAEResnet(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=_gn(x.shape[-1]), epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=_gn(h.shape[-1]), epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head spatial self-attention at the VAE mid block."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = nn.GroupNorm(num_groups=_gn(x.shape[-1]), epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        h = h.reshape(b, hh * ww, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(h)
        s = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32) / math.sqrt(c)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        h = jnp.einsum("bqk,bkc->bqc", p, v)
        h = nn.Dense(c, dtype=self.dtype, name="to_out_0")(h)
        return x + h.reshape(b, hh, ww, c)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = VAEResnet(ch, dtype=self.dtype, name=f"down_{i}_resnet_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                # diffusers VAE downsampler uses asymmetric (0,1) padding.
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    ch, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype,
                    name=f"down_{i}_downsample",
                )(h)
        mid_ch = cfg.block_out_channels[-1]
        h = VAEResnet(mid_ch, dtype=self.dtype, name="mid_resnet_0")(h)
        h = VAEAttention(mid_ch, dtype=self.dtype, name="mid_attn")(h)
        h = VAEResnet(mid_ch, dtype=self.dtype, name="mid_resnet_1")(h)
        h = nn.GroupNorm(num_groups=_gn(h.shape[-1]), epsilon=1e-6, dtype=self.dtype, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        rev = list(reversed(cfg.block_out_channels))
        h = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = VAEResnet(rev[0], dtype=self.dtype, name="mid_resnet_0")(h)
        h = VAEAttention(rev[0], dtype=self.dtype, name="mid_attn")(h)
        h = VAEResnet(rev[0], dtype=self.dtype, name="mid_resnet_1")(h)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnet(ch, dtype=self.dtype, name=f"up_{i}_resnet_{j}")(h)
            if i < len(rev) - 1:
                b, hh, ww, c = h.shape
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=_gn(h.shape[-1]), epsilon=1e-6, dtype=self.dtype, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(
            2 * self.config.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv"
        )
        self.post_quant_conv = nn.Conv(
            self.config.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv"
        )

    def encode_moments(self, x):
        """(B,H,W,3) image in [-1,1] -> (mean, logvar) each (B,H/8,W/8,4)."""
        moments = self.quant_conv(self.encoder(x))
        return jnp.split(moments, 2, axis=-1)

    def encode(self, x):
        """Latent-distribution mean, scaled — the reference's image2latent
        (p2p/inversion/ddim.py:35-41)."""
        mean, _ = self.encode_moments(x)
        return mean * self.config.scaling_factor

    def decode(self, z):
        """Scaled latents -> (B,H,W,3) in [-1,1]
        (reference latent2image, p2p/model/sd_utils.py:82-88)."""
        z = z / self.config.scaling_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x):
        return self.decode(self.encode(x))


def decode_tiled(
    vae: AutoencoderKL,
    params,
    z: jnp.ndarray,  # (B, h, w, 4) scaled latents
    tile: int = 64,
    overlap: int = 16,
) -> jnp.ndarray:
    """Memory-bounded decode: split the latent into overlapping spatial
    tiles, decode each through ONE compiled tile program, and linearly blend
    the overlaps (row then column ramps — the diffusers enable_vae_tiling
    recipe, expressed with static tile grids so XLA compiles a single tile
    decoder). Peak activation memory drops from O(H*W) to O(tile^2 * 64)
    regardless of image size — the XL 1024^2 (and beyond: 2048^2) headroom
    lever (ROADMAP round-1 item 7).

    ``tile``/``overlap`` are in latent pixels; the decoded tiles overlap by
    scale*overlap image pixels (scale = the decoder's upsampling factor, 8
    for SD VAEs).
    """
    b, h, w, c = z.shape
    if h <= tile and w <= tile:
        return vae.apply(params, z, method=AutoencoderKL.decode)
    # Small tiles with the default overlap would give a non-positive stride
    # (and out-of-range ramp writes); cap the overlap at half the tile.
    overlap = min(overlap, tile // 2)
    stride = tile - overlap
    rows = max(1, -(-(h - overlap) // stride))
    cols = max(1, -(-(w - overlap) // stride))
    # probe the decoder's upsampling factor cheaply from a zero tile shape
    scale = jax.eval_shape(
        lambda zt: vae.apply(params, zt, method=AutoencoderKL.decode),
        jax.ShapeDtypeStruct((b, tile, tile, c), z.dtype),
    ).shape[1] // tile
    out_tile = tile * scale
    out_ov = overlap * scale
    img_h, img_w = h * scale, w * scale

    ramp1d = jnp.arange(1, out_ov + 1, dtype=jnp.float32) / (out_ov + 1)

    def edge_weights(t0, full):
        wgt = jnp.ones((out_tile,), jnp.float32)
        if t0 > 0:
            wgt = wgt.at[:out_ov].set(ramp1d)
        if t0 + out_tile < full:
            wgt = wgt.at[-out_ov:].set(ramp1d[::-1])
        return wgt

    # decode AND accumulate tile by tile so only one decoded tile is live at
    # a time (keeping the whole grid would approach full-image memory again)
    canvas = jnp.zeros((b, img_h, img_w, 3), z.dtype)
    weight = jnp.zeros((1, img_h, img_w, 1), jnp.float32)
    for r in range(rows):
        y = min(r * stride, h - tile)
        for cidx in range(cols):
            x = min(cidx * stride, w - tile)
            zt = jax.lax.dynamic_slice(z, (0, y, x, 0), (b, tile, tile, c))
            timg = vae.apply(params, zt, method=AutoencoderKL.decode)
            ty, tx = y * scale, x * scale
            wt = (
                edge_weights(ty, img_h)[:, None]
                * edge_weights(tx, img_w)[None, :]
            )[None, :, :, None]
            canvas = jax.lax.dynamic_update_slice(
                canvas,
                jax.lax.dynamic_slice(
                    canvas, (0, ty, tx, 0), (b, out_tile, out_tile, 3)
                )
                + (timg.astype(jnp.float32) * wt).astype(canvas.dtype),
                (0, ty, tx, 0),
            )
            weight = jax.lax.dynamic_update_slice(
                weight,
                jax.lax.dynamic_slice(
                    weight, (0, ty, tx, 0), (1, out_tile, out_tile, 1)
                )
                + wt,
                (0, ty, tx, 0),
            )
    return (canvas.astype(jnp.float32) / jnp.maximum(weight, 1e-6)).astype(
        canvas.dtype
    )
