"""Fast random parameter trees for benchmarks and compile checks.

``jax.jit(module.init)`` on an 860M-param UNet compiles a huge initialization
graph (minutes). Benchmarks only need weights with realistic magnitudes —
compute cost is identical — so this fills the eval_shape skeleton with small
host-generated normals instead.
"""

from __future__ import annotations

import jax
import numpy as np


def fast_random_params(
    module, *args, seed: int = 0, scale: float = 0.02, realistic: bool = False,
    param_dtype=None, **kwargs,
):
    """Shape-inferred param tree filled with N(0, scale^2), generated ON
    DEVICE per leaf in the leaf's dtype inside one jit (no giant init graph
    to compile, no multi-GB host->device transfer, no float32 staging buffer
    — a single flat f32 draw would need 10.3 GB for SDXL).

    ``realistic=True`` centers norm ``scale`` leaves at 1.0 instead of 0 so
    the network is *live* (pure N(0, 0.02) norm scales attenuate activations
    to ~0 after a few blocks, which would make golden-output hashes
    insensitive to kernel changes — the validation runway's whole point).

    ``param_dtype`` overrides the skeleton leaves' storage dtype for
    floating leaves (flax defaults param leaves to f32 regardless of the
    module's computation dtype; production checkpoints load as bf16 via the
    registry — XL f32 params alone are ~14 GB and fill a 16 GB chip). The
    cast happens inside the jit, so XLA fuses it into the draw and no f32
    copy is ever materialized."""
    skeleton = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs))
    leaves_p, treedef = jax.tree_util.tree_flatten_with_path(skeleton)

    @jax.jit
    def make(key):
        out = []
        for i, (path, leaf) in enumerate(leaves_p):
            k = jax.random.fold_in(key, i)
            dt = leaf.dtype
            if param_dtype is not None and jax.numpy.issubdtype(dt, jax.numpy.floating):
                dt = param_dtype
            x = jax.random.normal(k, leaf.shape, dt) * scale
            if realistic and getattr(path[-1], "key", None) == "scale":
                x = x + 1.0  # weak-typed: stays in the leaf's dtype
            out.append(x)
        return jax.tree_util.tree_unflatten(treedef, out)

    return make(jax.random.PRNGKey(seed))
