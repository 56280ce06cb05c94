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
    """Shape-inferred param tree filled with N(0, scale^2), generated ON
    DEVICE: one flat normal draw sliced into leaves inside a single small jit
    (no giant init graph to compile, no multi-GB host->device transfer)."""
    skeleton = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs))
    leaves, treedef = jax.tree_util.tree_flatten(skeleton)
    sizes = [int(np.prod(l.shape)) for l in leaves]
    total = sum(sizes)

    @jax.jit
    def make(key):
        flat = jax.random.normal(key, (total,), jnp.float32) * scale
        out, off = [], 0
        for leaf, n in zip(leaves, sizes):
            out.append(flat[off : off + n].reshape(leaf.shape).astype(leaf.dtype))
            off += n
        return jax.tree_util.tree_unflatten(treedef, out)

    return make(jax.random.PRNGKey(seed))
