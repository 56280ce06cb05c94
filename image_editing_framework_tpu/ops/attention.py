"""Attention dispatch: fused self-attention + editable cross-attention.

Design (the TPU inversion of the reference's hook architecture, SURVEY.md §7):

* **Self-attention** never materializes probabilities. Every method's
  self-attention edit is a per-batch-element index remap of Q / K / V
  (see ops/flash_attention.py docstring), described by a ``SelfAttnPlan``
  produced by the active control pytree, executed as XLA gathers feeding the
  fused flash kernel. Multi-segment K/V (MasaCtrl "union",
  masactrl/model/attention_control.py:102-103) concatenates gathered segments
  with an additive per-key bias masking invalid segments.

* **Cross-attention** (K = 77 text tokens) materializes probabilities
  explicitly in float32 — a skinny (N, 77) matrix, cheap on the MXU — because
  P2P edits probabilities directly (p2p/model/attention_base.py:113-125) and
  pix2pix-zero differentiates through them
  (pix2pix-zero/model/sd_utils.py:166-172). XLA fuses softmax+einsum; being
  plain jnp it is differentiable for free (NTI / p2z gradients).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from image_editing_framework_tpu.ops.flash_attention import (
    flash_attention,
    reference_attention,
    NEG_INF,
)


@dataclasses.dataclass(frozen=True)
class AttnSite:
    """Static identity of one attention layer inside the UNet.

    ``layer`` is the transformer-block index in forward execution order
    (down -> mid -> up), matching the reference's ``cur_att_layer // 2``
    gating (masactrl/model/attention_control.py:56): 0..15 for SD,
    0..69 for SDXL.
    """

    layer: int
    place: str  # 'down' | 'mid' | 'up'
    seq_len: int
    is_cross: bool

    @property
    def key(self) -> str:
        return f"{self.place}_l{self.layer}_{'cross' if self.is_cross else 'self'}"


@struct.dataclass
class SelfAttnPlan:
    """Batch-index remap plan for one self-attention site.

    q_idx:  (B,)   source batch element for each element's queries.
    k_idx:  (B,S)  source batch elements for S concatenated K segments.
    v_idx:  (B,S)  same for V.
    valid:  (B,S)  False segments are masked out of the softmax.
    """

    q_idx: jnp.ndarray
    k_idx: jnp.ndarray
    v_idx: jnp.ndarray
    valid: jnp.ndarray


def identity_plan(batch: int) -> SelfAttnPlan:
    iota = jnp.arange(batch, dtype=jnp.int32)
    ones = jnp.ones((batch, 1), dtype=bool)
    return SelfAttnPlan(iota, iota[:, None], iota[:, None], ones)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    plan: Optional[SelfAttnPlan],
    use_flash: bool = True,
    cp_mesh=None,
    cp_axis: str = "data",
    cp_mode: str = "ring",
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused self-attention with optional batch-index remapping.

    q/k/v: (B, H, N, D). plan=None means no edit (skips the gathers).
    ``cp_mesh`` switches to context-parallel attention with the sequence
    sharded over ``cp_axis`` — ``cp_mode`` picks ring (ppermute KV rotation)
    or Ulysses (all_to_all head<->sequence reshard). Editing remaps compose
    with it (gathers run before the CP collective), including the
    multi-segment bias path (MasaCtrl union): the per-key bias shards and
    rotates with K/V. ``use_flash`` selects the Pallas local step inside CP.
    ``bias`` is an explicit per-key additive logit bias (B, Nk) — the masked
    MasaCtrl primitives — added to any plan-segment bias (it addresses the
    post-gather key layout) and CP-sharded like K.
    """
    b, h, n, d = q.shape
    if plan is not None:
        q = q[plan.q_idx]
        s = plan.k_idx.shape[1]
        k = k[plan.k_idx.reshape(-1)].reshape(b, s, h, n, d)
        k = k.transpose(0, 2, 1, 3, 4).reshape(b, h, s * n, d)
        v = v[plan.v_idx.reshape(-1)].reshape(b, s, h, n, d)
        v = v.transpose(0, 2, 1, 3, 4).reshape(b, h, s * n, d)
        if s > 1:
            seg = jnp.where(plan.valid, 0.0, NEG_INF).astype(jnp.float32)  # (B,S)
            seg = jnp.repeat(seg, n, axis=1)  # (B, S*N)
            bias = seg if bias is None else bias + seg
    if cp_mesh is not None:
        from image_editing_framework_tpu.parallel.ring_attention import (
            ring_self_attention,
            ulysses_ring_attention,
            ulysses_self_attention,
        )

        if cp_mode == "ulysses_ring":
            head_axis, seq_axis = (
                cp_axis if isinstance(cp_axis, (tuple, list)) else ("tensor", "data")
            )
            return ulysses_ring_attention(
                q, k, v, cp_mesh, head_axis, seq_axis, bias=bias,
                use_flash=use_flash,
            )
        cp_fn = (
            ulysses_self_attention if cp_mode == "ulysses" else ring_self_attention
        )
        return cp_fn(q, k, v, cp_mesh, cp_axis, bias=bias, use_flash=use_flash)
    if use_flash:
        return flash_attention(q, k, v, bias)
    # Explicit XLA path (oracle / CPU).
    scale = 1.0 / math.sqrt(d)
    s_ = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if bias is not None:
        s_ = s_ + bias[:, None, None, :]
    p = jax.nn.softmax(s_, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def masked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    use_flash: Optional[bool] = None,
    cp_mesh=None,
    cp_axis: str = "data",
    cp_mode: str = "ring",
) -> jnp.ndarray:
    """Attention with a per-key additive logit bias (B, Nk) — the masked
    MasaCtrl primitives (masactrl/model/attention_control.py:142-151).
    ``cp_mesh`` runs it context-parallel (the bias shards/rotates with K)."""
    import jax as _jax

    if use_flash is None:
        use_flash = _jax.default_backend() == "tpu"
    return self_attention(
        q, k, v, None, use_flash=use_flash, cp_mesh=cp_mesh, cp_axis=cp_axis,
        cp_mode=cp_mode, bias=bias,
    )


def cross_attention_probs(
    q: jnp.ndarray, k: jnp.ndarray, sm_scale: Optional[float] = None
) -> jnp.ndarray:
    """Explicit float32 cross-attention probabilities (B, H, N, 77)."""
    d = q.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * sm_scale
    return jax.nn.softmax(s, axis=-1)


def apply_probs(probs: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
