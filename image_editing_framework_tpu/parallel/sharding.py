"""Parameter partition specs (tensor parallelism) + sharded step builders.

TP strategy for the SD UNet (new design — the reference has no distributed
path, SURVEY.md §2.3): shard every attention projection and feed-forward
kernel over the 'tensor' axis — to_q/to_k/to_v and the GEGLU up-projection on
the *output* (head/hidden) dimension, to_out and the FF down-projection on
the *input* dimension, so each chip computes its head/hidden shard locally
and XLA GSPMD inserts one psum per block output (the classic Megatron split,
expressed as shardings rather than hand-written collectives). Convolutions
and norms are replicated: they are bandwidth-cheap relative to HBM capacity
and sharding them would force halo exchanges.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_COL_PARALLEL = ("to_q", "to_k", "to_v", "geglu_proj", "fc1", "q_proj", "k_proj", "v_proj")
_ROW_PARALLEL = ("to_out_0", "out_proj", "fc2")


def _spec_for_path(path: Tuple[str, ...], leaf) -> P:
    names = [p for p in path]
    leaf_name = names[-1]
    if leaf_name != "kernel" or leaf.ndim != 2:
        return P()  # biases, norms, convs, embeddings: replicated
    parent = names[-2]
    if parent in _COL_PARALLEL:
        return P(None, "tensor")
    if parent in _ROW_PARALLEL:
        return P("tensor", None)
    return P()


def unet_param_specs(params: Any) -> Any:
    """PartitionSpec pytree matching a UNet/CLIP param tree."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec(path, leaf):
        names = tuple(
            k.key if hasattr(k, "key") else str(k) for k in path
        )
        return _spec_for_path(names, leaf)

    specs = [spec(p, l) for p, l in flat]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), specs
    )


def shard_params(params: Any, mesh: Mesh) -> Any:
    specs = unet_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def make_sharded_train_step(
    unet, mesh: Mesh, learning_rate: float = 1e-4, use_flash: bool | None = None
):
    """A full dp+tp training step over the UNet (noise-prediction MSE).

    The framework's own optimization loops (NTI, pix2pix-zero guidance) are
    latent/embedding-space; this step additionally exercises the
    param-gradient path under sharding: batch sharded over 'data', attention
    and FF kernels sharded over 'tensor', gradient reduction and optimizer
    update run under the same shardings (XLA inserts the psums).
    """
    tx = optax.adam(learning_rate)
    if use_flash is None:
        # interpret-mode Pallas is too slow for CPU dryruns; the kernel (and
        # its custom VJP) engage on real TPU.
        use_flash = jax.default_backend() == "tpu"

    def loss_fn(params, latents, t, context, target):
        eps, _ = unet.apply(params, latents, t, context, None, None, use_flash)
        return jnp.mean((eps - target) ** 2)

    def train_step(params, opt_state, latents, t, context, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, latents, t, context, target)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    param_specs = None

    def init(params):
        nonlocal param_specs
        param_specs = unet_param_specs(params)
        sharded = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, param_specs
        )
        opt_state = tx.init(sharded)
        return sharded, opt_state

    def jitted(params, opt_state):
        data = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        pshard = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), param_specs
        )
        oshard = jax.tree_util.tree_map(
            lambda x: NamedSharding(mesh, P()) if x.ndim == 0 else None,
            opt_state,
            is_leaf=lambda x: hasattr(x, "ndim"),
        )
        del oshard  # optimizer state inherits param shardings via GSPMD
        return jax.jit(
            train_step,
            in_shardings=(pshard, None, data, rep, data, data),
            out_shardings=(pshard, None, rep),
        )

    return init, jitted
