"""Timestep / conditioning embeddings (Flax).

Sinusoidal projection semantics follow the SD family's configuration
(flip_sin_to_cos=True, downscale_freq_shift=0) so loaded PyTorch weights for
the MLPs line up. The reference consumes these through diffusers' UNet
(SURVEY.md §2.2).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """(B,) int/float timesteps -> (B, dim) embedding."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb.astype(dtype)


class TimestepEmbedding(nn.Module):
    """Two-layer MLP lifting the sinusoidal projection to the block width."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(x)
