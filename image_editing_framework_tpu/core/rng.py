"""Seeding / RNG utilities.

The reference uses ``seed_everything`` + torch generators
(p2p/edit_real.py:37, p2p/model/sd_utils.py:15 randn_tensor). JAX's splittable
PRNG replaces the global-generator pattern: one key per CLI ``--seed``,
``fold_in`` for per-image / per-chip streams.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def key_from_seed(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def latents_like(key: jax.Array, batch: int, h: int, w: int, c: int = 4, dtype=jnp.float32):
    """Initial N(0,1) latents in NHWC layout."""
    return jax.random.normal(key, (batch, h, w, c), dtype=dtype)


def per_image_key(key: jax.Array, image_index: int) -> jax.Array:
    """Deterministic per-image stream for the PIE-Bench sweep."""
    return jax.random.fold_in(key, image_index)
