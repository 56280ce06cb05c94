"""The shared denoising loop: one jitted ``lax.scan`` over DDIM steps.

Replaces the reference's per-method Python loops (p2p/model/sd_utils.py:61-80,
masactrl/model/sd_utils.py:94-117, pnp/model/sd_utils.py:90-110): latents for
all P prompt branches advance together; classifier-free guidance doubles the
batch inside the step ([uncond x P, cond x P], the reference's
``torch.cat([latents] * 2)`` convention); the editing control is sliced per
step with ``ctrl.at_step(i)``; LocalBlend accumulates recorded 16x16
cross-attention maps in the scan carry and blends after every scheduler step
(p2p/model/sd_utils.py:78 ``controller.step_callback``).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from image_editing_framework_tpu.core.scheduler import DDIMSchedule, ddim_step
from image_editing_framework_tpu.ops.controls import NoneControl


@struct.dataclass
class LocalBlend:
    """Word-mask latent blending (reference: p2p/model/ptp_utils.py:6-32).

    Accumulates the P2P control's recorded 16x16 cross-attention maps across
    steps; each step derives a spatial mask from the word-selected maps and
    blends every branch's latent toward the source's outside the mask.
    """

    alpha_layers: jnp.ndarray  # (P, 77)
    threshold: float = struct.field(pytree_node=False, default=0.3)

    def __call__(self, x_t: jnp.ndarray, store: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        if not store:
            return x_t
        maps = jnp.stack(list(store.values()), axis=1)  # (P, M, 256, 77)
        p, m, n, _ = maps.shape
        side = int(n**0.5)
        masked = (maps.astype(jnp.float32) * self.alpha_layers[:, None, None, :]).sum(-1)
        masked = masked.mean(1).reshape(p, side, side)
        # 3x3 max-pool, stride 1, SAME (reference: nnf.max_pool2d(k=3, pad=1)).
        pooled = jax.lax.reduce_window(
            masked, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME"
        )
        h, w = x_t.shape[1:3]
        mask = jax.image.resize(pooled, (p, h, w), method="nearest")
        mask = mask / jnp.max(mask, axis=(1, 2), keepdims=True)
        mask = mask > self.threshold
        union = jnp.any(mask, axis=0).astype(x_t.dtype)[None, :, :, None]
        return x_t[:1] + union * (x_t - x_t[:1])


def _record_shapes(unet_apply_fn, latents, t, context, step_ctrl, added):
    """Shape-evaluate the per-step records pytree to initialize scan state."""
    out = jax.eval_shape(unet_apply_fn, latents, t, context, step_ctrl, added)
    return out[1]


@functools.partial(
    jax.jit,
    static_argnames=(
        "unet", "use_flash", "collect_records", "collect_trajectory",
        "has_blend", "store_mode",
    ),
)
def _denoise_scan(
    unet,
    unet_params,
    sched: DDIMSchedule,
    latents: jnp.ndarray,  # (P, h, w, 4)
    context: jnp.ndarray,  # (2P, 77, D)
    ctrl,
    guidance_scale,
    added_cond,  # dict of (2P, ...) or None
    uncond_seq,  # (S, 77, D) per-step uncond embeddings (NTI) or None
    blend,  # LocalBlend or None (pytree; gated by has_blend)
    source_replay,  # (S+1, 1, h, w, 4) inversion trajectory or None
    use_flash: bool,
    collect_records: bool,
    collect_trajectory: bool,
    has_blend: bool,
    store_mode: Optional[str],  # None | 'sum' (LocalBlend cross-step average)
):
    p = latents.shape[0]
    steps = sched.num_steps

    def unet_fn(lat_in, t, ctx, step_ctrl):
        return unet.apply(unet_params, lat_in, t, ctx, step_ctrl, added_cond, use_flash)

    def make_context(i):
        if uncond_seq is None:
            return context
        u = jnp.broadcast_to(uncond_seq[i][None], (p,) + context.shape[1:])
        return jnp.concatenate([u.astype(context.dtype), context[p:]], axis=0)

    # Initialize the carried record store with correctly-shaped zeros.
    store0: Dict[str, jnp.ndarray] = {}
    if store_mode is not None:
        shapes = jax.eval_shape(
            unet_fn,
            jnp.concatenate([latents] * 2),
            sched.timesteps[0],
            make_context(0),
            ctrl.at_step(0),
        )[1]
        store0 = {k: jnp.zeros(v.shape, jnp.float32) for k, v in shapes.items()}

    def step_fn(carry, i):
        lat, store = carry
        step_ctrl = ctrl.at_step(i)
        if store_mode is not None:
            step_ctrl = step_ctrl.bind_store(store, i)
        t = sched.timesteps[i]
        if source_replay is not None:
            # MasaCtrl's ref_intermediate_latents re-injection: the source
            # branch replays its inversion trajectory
            # (masactrl/model/sd_utils.py:95-99).
            lat = jnp.concatenate([source_replay[steps - i], lat[1:]], axis=0)
        lat_entry = lat  # the (post-replay) latent ENTERING step i
        lat_in = jnp.concatenate([lat] * 2, axis=0)
        eps, rec = unet_fn(lat_in, t, make_context(i), step_ctrl)
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        eps_g = eps_u + guidance_scale * (eps_c - eps_u)
        lat = ddim_step(sched, eps_g, i, lat)
        if store_mode == "sum":
            store = {k: store[k] + rec[k].astype(jnp.float32) for k in store}
        if has_blend:
            lat = blend(lat, store)
        # trajectory ys carry the exact UNet input latent of step i, so a
        # later pass can rematerialize this step's records instead of storing
        # them (p2z recompute_refs: ~6 GB of XL maps -> ~2 MB of latents).
        ys = (
            rec if collect_records else None,
            lat_entry if collect_trajectory else None,
        )
        return (lat, store), ys

    (lat, _), (rec_ys, traj_ys) = jax.lax.scan(
        step_fn, (latents, store0), jnp.arange(steps)
    )
    return lat, rec_ys, traj_ys


def denoise(
    pipe,
    latents: jnp.ndarray,
    context: jnp.ndarray,
    ctrl=None,
    guidance_scale: float = 7.5,
    added_cond: Optional[Dict[str, jnp.ndarray]] = None,
    uncond_seq: Optional[jnp.ndarray] = None,
    blend: Optional[LocalBlend] = None,
    source_replay: Optional[jnp.ndarray] = None,
    use_flash: bool = True,
    collect_records: bool = False,
    collect_trajectory: bool = False,
):
    """Run the full DDIM denoising loop.

    Returns (final_latents, records_ys), or (final_latents, records_ys,
    trajectory_ys) when ``collect_trajectory``. ``records_ys`` is a dict of
    per-step stacked recorded arrays when ``collect_records`` (pix2pix-zero
    pass 1), else None; ``trajectory_ys`` is the (S, P, h, w, 4) per-step
    UNet-input latents (p2z recompute_refs rematerialization).
    """
    if ctrl is None:
        ctrl = NoneControl()
    store_mode = "sum" if blend is not None else None
    lat, rec_ys, traj_ys = _denoise_scan(
        pipe.unet,
        pipe.unet_params,
        pipe.scheduler,
        latents,
        context,
        ctrl,
        jnp.asarray(guidance_scale, latents.dtype),
        added_cond,
        uncond_seq,
        blend if blend is not None else LocalBlend(jnp.zeros((1, 77))),
        source_replay,
        use_flash,
        collect_records,
        collect_trajectory,
        blend is not None,
        store_mode,
    )
    if collect_trajectory:
        return lat, rec_ys, traj_ys
    return lat, rec_ys
