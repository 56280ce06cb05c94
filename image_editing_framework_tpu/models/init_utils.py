"""Fast random parameter trees for benchmarks and compile checks.

``jax.jit(module.init)`` on an 860M-param UNet compiles a huge initialization
graph (minutes). Benchmarks only need weights with realistic magnitudes —
compute cost is identical — so this fills the eval_shape skeleton with small
host-generated normals instead.
"""

from __future__ import annotations

import jax
import numpy as np


def fast_random_params(module, *args, seed: int = 0, scale: float = 0.02, **kwargs):
    """Shape-inferred param tree filled with N(0, scale^2), generated ON
    DEVICE per leaf in the leaf's dtype inside one jit (no giant init graph
    to compile, no multi-GB host->device transfer, no float32 staging buffer
    — a single flat f32 draw would need 10.3 GB for SDXL)."""
    skeleton = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs))
    leaves, treedef = jax.tree_util.tree_flatten(skeleton)

    @jax.jit
    def make(key):
        out = []
        for i, leaf in enumerate(leaves):
            k = jax.random.fold_in(key, i)
            out.append(jax.random.normal(k, leaf.shape, leaf.dtype) * scale)
        return jax.tree_util.tree_unflatten(treedef, out)

    return make(jax.random.PRNGKey(seed))
