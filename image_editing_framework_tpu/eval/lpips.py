"""LPIPS perceptual distance (VGG16 backbone) in Flax.

The reference lists torchmetrics in requirements but never computes metrics
(SURVEY.md §4); the BASELINE targets require LPIPS parity measurements, so
the network lives here. Weights load from the standard PyTorch artifacts:

* torchvision ``vgg16`` state_dict (``features.N.{weight,bias}``),
* the LPIPS linear heads (``lin{i}.model.1.weight``) from the official
  richzhang/PerceptualSimilarity release,

via the same transpose conventions as models/loader.py. Without weight files
the module still runs (random init) for shape/behavior tests, but
``LPIPS.from_torch_files`` is the supported path for real measurements.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 conv layout: (out_channels, torchvision features index)
_VGG16_CONVS: Tuple[Tuple[int, int], ...] = (
    (64, 0), (64, 2),
    (128, 5), (128, 7),
    (256, 10), (256, 12), (256, 14),
    (512, 17), (512, 19), (512, 21),
    (512, 24), (512, 26), (512, 28),
)
# feature taps after these conv indices (relu1_2 ... relu5_3)
_TAPS = (1, 3, 6, 9, 12)
_POOL_AFTER = (1, 3, 6, 9)  # maxpool follows these conv indices

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        taps = []
        for i, (ch, _) in enumerate(_VGG16_CONVS):
            x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.relu(x)
            if i in _TAPS:
                taps.append(x)
            if i in _POOL_AFTER:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPSNet(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """a, b: (B, H, W, 3) in [-1, 1]. Returns (B,) distances."""
        a = (a - _SHIFT) / _SCALE
        b = (b - _SHIFT) / _SCALE
        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        fa, fb = vgg(a), vgg(b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / jnp.sqrt(jnp.sum(xa**2, -1, keepdims=True) + 1e-10)
            nb = xb / jnp.sqrt(jnp.sum(xb**2, -1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2
            w = nn.Conv(
                1, (1, 1), use_bias=False, dtype=self.dtype, name=f"lin_{i}"
            )(d)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


class LPIPS:
    """Callable LPIPS metric. Random-init unless built from weight files."""

    def __init__(self, params=None, dtype=jnp.float32):
        self.net = LPIPSNet(dtype=dtype)
        if params is None:
            params = self.net.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 64, 64, 3)),
                jnp.zeros((1, 64, 64, 3)),
            )
        self.params = params

    @classmethod
    def from_torch_files(cls, vgg_state: Dict[str, np.ndarray],
                         lin_state: Dict[str, np.ndarray], dtype=jnp.float32):
        """Build from a torchvision vgg16 state_dict + LPIPS linear heads."""
        params: Dict[str, Dict] = {"vgg": {}}
        for i, (_, tv_idx) in enumerate(_VGG16_CONVS):
            params["vgg"][f"conv_{i}"] = {
                "kernel": np.asarray(
                    vgg_state[f"features.{tv_idx}.weight"]
                ).transpose(2, 3, 1, 0),
                "bias": np.asarray(vgg_state[f"features.{tv_idx}.bias"]),
            }
        for i in range(5):
            w = np.asarray(lin_state[f"lin{i}.model.1.weight"])  # (1, C, 1, 1)
            params[f"lin_{i}"] = {"kernel": w.transpose(2, 3, 1, 0)}
        params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
        return cls({"params": params}, dtype=dtype)

    def __call__(self, a: np.ndarray, b: np.ndarray) -> float:
        """a, b: uint8 (B, H, W, 3) or float in [-1, 1]."""
        a = jnp.asarray(a)
        b = jnp.asarray(b)
        if a.dtype == jnp.uint8:
            a = a.astype(jnp.float32) / 127.5 - 1.0
        if b.dtype == jnp.uint8:
            b = b.astype(jnp.float32) / 127.5 - 1.0
        return float(jnp.mean(self.net.apply(self.params, a, b)))
