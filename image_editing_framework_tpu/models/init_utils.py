"""Fast random parameter trees for benchmarks and compile checks.

``jax.jit(module.init)`` on an 860M-param UNet compiles a huge initialization
graph (minutes). Benchmarks only need weights with realistic magnitudes —
compute cost is identical — so this fills the eval_shape skeleton with small
host-generated normals instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fast_random_params(module, *args, seed: int = 0, scale: float = 0.02, **kwargs):
    """Shape-inferred param tree filled with N(0, scale^2) host-side."""
    skeleton = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs))
    rng = np.random.RandomState(seed)
    leaves, treedef = jax.tree_util.tree_flatten(skeleton)
    out = []
    for leaf in leaves:
        arr = rng.standard_normal(leaf.shape).astype(np.float32) * scale
        out.append(jnp.asarray(arr, leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)
