"""Context parallelism: ring / Ulysses attention over latent tokens.

The reference materializes full O(N^2) attention on one GPU, topping out at
SDXL's 16384-token self-attention (masactrl/model/register.py:35;
SURVEY.md §5 long-context note). For multi-chip scale-out this module shards
the *sequence* dimension across a mesh axis: each chip holds an N/n_dev slice
of Q/K/V, K/V blocks rotate around the ring via ``jax.lax.ppermute`` while
each chip accumulates blockwise-softmax partial results — communication
overlaps compute, and per-chip memory drops from O(N) KV to O(N/n_dev).

Two local-step implementations:

* **kernel path** (``use_flash=True``): the fused Pallas flash kernel runs
  each per-chip block (``flash_attention_fwd_lse``), partial results merge
  with the two-estimate log-sum-exp combine, and a custom VJP implements the
  exact ring backward — KV blocks rotate again, each block's (dk, dv)
  accumulator rides along with it and one final rotation delivers it home;
  per-block gradients use the *global* lse so their sum is the exact
  full-sequence gradient (``flash_attention_bwd_block``).
* **XLA path** (``use_flash=False``): explicit blockwise softmax, used on
  CPU meshes (tests / dryruns) where Pallas only interprets.

Both accept a per-key additive logit bias (B, Nk) sharded like K — this is
what makes MasaCtrl-union's multi-segment K/V CP-compatible
(masactrl/model/attention_control.py:102-103): the segment-validity bias
simply rotates with its K/V block.

Also provides the Ulysses-style alternative: all_to_all resharding
heads <-> sequence around a fully local attention (the bias is all-gathered —
O(N) floats) — cheaper than the ring when heads >= chips.

Partial results merge with the standard two-estimate log-sum-exp combine:
    m = max(lse1, lse2); w_i = exp(lse_i - m)
    out = (o1 w1 + o2 w2) / (w1 + w2);  lse = m + log(w1 + w2)
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from image_editing_framework_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_bwd_block,
    flash_attention_fwd_lse,
)


def _attention_with_lse(q, k, v, sm_scale, bias=None):
    """Blockwise attention returning (out, lse) — explicit XLA local step."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * sm_scale
    if bias is not None:
        s = s + bias[:, None, None, :]
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    lse = m + jnp.log(jnp.maximum(l, 1e-37))
    return out / jnp.maximum(l, 1e-37)[..., None].astype(out.dtype), lse


def _merge(o1, lse1, o2, lse2):
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - m)
    w2 = jnp.exp(lse2 - m)
    den = w1 + w2
    o = (
        o1 * (w1 / den)[..., None].astype(o1.dtype)
        + o2 * (w2 / den)[..., None].astype(o2.dtype)
    )
    return o, m + jnp.log(den)


def _ring_forward(local_attn, rot, n_dev, q, k, v, bias):
    """The shared forward rotation loop: local block attention, K/V (+bias)
    ppermute, log-sum-exp merge. ``local_attn(q, k, v, bias) -> (out, lse)``
    is the kernel or XLA local step."""
    out, lse = local_attn(q, k, v, bias)

    def body(_, carry):
        out, lse, kb, vb, bb = carry
        kb, vb, bb = rot(kb), rot(vb), rot(bb)
        o_i, lse_i = local_attn(q, kb, vb, bb)
        out, lse = _merge(out, lse, o_i, lse_i)
        return out, lse, kb, vb, bb

    out, lse, _, _, _ = jax.lax.fori_loop(
        0, n_dev - 1, body, (out, lse, k, v, bias)
    )
    return out, lse


def _make_ring_kernel_local(axis_name: str, n_dev: int, sm_scale: float):
    """Per-chip ring step with the Pallas kernel + exact ring VJP.

    Returned function takes LOCAL blocks (q, k, v, bias) under shard_map.
    """
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    # Tile sizes: the lse output buffer lives in scoped VMEM alongside the
    # usual flash tiles; the single-device default (2048-query tiles at >=4k
    # tokens) overflows the 16 MB scoped budget here, 1024/1024 fits with
    # indistinguishable MXU utilization.
    BQ, BK = 1024, 1024

    def rot(x):
        return jax.lax.ppermute(x, axis_name, perm)

    def local_attn(q, k, v, bias):
        return flash_attention_fwd_lse(
            q, k, v, bias, sm_scale, block_q=BQ, block_k=BK
        )

    def fwd_core(q, k, v, bias):
        return _ring_forward(local_attn, rot, n_dev, q, k, v, bias)

    @jax.custom_vjp
    def ring(q, k, v, bias):
        return fwd_core(q, k, v, bias)[0]

    def ring_fwd(q, k, v, bias):
        out, lse = fwd_core(q, k, v, bias)
        return out, (q, k, v, bias, out, lse)

    def ring_bwd(res, g):
        q, k, v, bias, out, lse = res
        # Step 0: own block. The (dk, dv) accumulators then rotate together
        # with their KV block; after the loop one extra rotation returns each
        # accumulator to its owner chip.
        dq, dk, dv = flash_attention_bwd_block(
            q, k, v, bias, out, g, lse, sm_scale, block_q=BQ, block_k=BK
        )

        def body(_, carry):
            dq, dk, dv, kb, vb, bb = carry
            kb, vb, bb = rot(kb), rot(vb), rot(bb)
            dk, dv = rot(dk), rot(dv)
            dq_i, dk_i, dv_i = flash_attention_bwd_block(
                q, kb, vb, bb, out, g, lse, sm_scale, block_q=BQ, block_k=BK
            )
            return dq + dq_i, dk + dk_i, dv + dv_i, kb, vb, bb

        dq, dk, dv, _, _, _ = jax.lax.fori_loop(
            0, n_dev - 1, body, (dq, dk, dv, k, v, bias)
        )
        dk, dv = rot(dk), rot(dv)  # deliver the last block's grads home
        # bias is a mask schedule, not a learned quantity: zero cotangent.
        return dq, dk, dv, jnp.zeros_like(bias)

    ring.defvjp(ring_fwd, ring_bwd)
    return ring


def _make_ring_xla_local(axis_name: str, n_dev: int, sm_scale: float):
    """Per-chip ring step with explicit XLA attention (CPU meshes)."""
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def rot(x):
        return jax.lax.ppermute(x, axis_name, perm)

    def local_attn(q, k, v, bias):
        return _attention_with_lse(q, k, v, sm_scale, bias)

    def local_fn(q, k, v, bias):
        return _ring_forward(local_attn, rot, n_dev, q, k, v, bias)[0]

    return local_fn


def ring_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "data",
    sm_scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
    use_flash: bool = False,
) -> jnp.ndarray:
    """Full self-attention with Q and K/V sequence-sharded over ``axis_name``.

    q: (B, H, Nq, D), k/v: (B, H, Nk, D) global shapes; Nq and Nk must divide
    by the axis size (Nk may differ from Nq — MasaCtrl-union concatenates
    S segments). ``bias``: optional (B, Nk) per-key logit bias sharded with
    K. ``use_flash`` selects the Pallas-kernel local step (TPU).
    Returns (B, H, Nq, D) with q's sequence sharding.
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    n_dev = mesh.shape[axis_name]
    if bias is None:
        bias = jnp.zeros((q.shape[0], k.shape[2]), jnp.float32)
    local = (
        _make_ring_kernel_local(axis_name, n_dev, sm_scale)
        if use_flash
        else _make_ring_xla_local(axis_name, n_dev, sm_scale)
    )
    spec = P(None, None, axis_name, None)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec, P(None, axis_name)),
        out_specs=spec,
        check_vma=False,  # pallas_call outputs carry no vma annotations
    )(q, k, v, bias)


def ulysses_ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    head_axis: str = "tensor",
    seq_axis: str = "data",
    sm_scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
    use_flash: bool = False,
) -> jnp.ndarray:
    """2D context parallelism: Ulysses over ``head_axis`` x ring over
    ``seq_axis`` (the unified-sequence-parallel composition). The sequence
    arrives sharded over BOTH axes (N / (hp*sp) tokens per chip, all heads);
    an all_to_all over the head axis re-shards to (H/hp heads, N/sp tokens),
    the ring covers the remaining sequence split, and the inverse all_to_all
    restores the layout. Scales past what either axis supports alone:
    Ulysses is capped at H chips, a long pure ring under-overlaps.

    The head-axis all_to_all interleaves sequence chunks (strided order) —
    harmless for attention (softmax is permutation-invariant over keys) as
    long as the per-key bias gathers in the same order, which the matching
    all_gather guarantees.
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    hp = mesh.shape[head_axis]
    sp = mesh.shape[seq_axis]
    assert q.shape[1] % hp == 0, "needs heads % head-axis size == 0"
    if bias is None:
        bias = jnp.zeros((q.shape[0], k.shape[2]), jnp.float32)
    ring_local = (
        _make_ring_kernel_local(seq_axis, sp, sm_scale)
        if use_flash
        else _make_ring_xla_local(seq_axis, sp, sm_scale)
    )

    def local_fn(q_blk, k_blk, v_blk, bias_blk):
        def seq_to_head(x):
            return jax.lax.all_to_all(
                x, head_axis, split_axis=1, concat_axis=2, tiled=True
            )

        def head_to_seq(x):
            return jax.lax.all_to_all(
                x, head_axis, split_axis=2, concat_axis=1, tiled=True
            )

        qh, kh, vh = seq_to_head(q_blk), seq_to_head(k_blk), seq_to_head(v_blk)
        bh = jax.lax.all_gather(bias_blk, head_axis, axis=1, tiled=True)
        out = ring_local(qh, kh, vh, bh)
        return head_to_seq(out)

    spec = P(None, None, (head_axis, seq_axis), None)
    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec, P(None, (head_axis, seq_axis))),
        out_specs=spec,
        check_vma=False,
    )(q, k, v, bias)


def ulysses_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "data",
    sm_scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
    use_flash: bool = False,
) -> jnp.ndarray:
    """All-to-all head<->sequence reshard around a fully local attention.

    Inputs arrive sequence-sharded (B, H, N, D); the all_to_all makes each
    chip hold ALL tokens for H/n_dev heads, attention runs locally (Pallas
    kernel when ``use_flash``) with no ring steps, and a second all_to_all
    restores sequence sharding. The per-key bias is all-gathered (O(Nk)
    floats — negligible). Requires H % axis_size == 0; differentiable for
    free (all_to_all/all_gather have transpose rules, the kernel has its own
    VJP).
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    n_dev = mesh.shape[axis_name]
    assert q.shape[1] % n_dev == 0, "Ulysses needs heads % devices == 0"
    if bias is None:
        bias = jnp.zeros((q.shape[0], k.shape[2]), jnp.float32)

    def local_fn(q_blk, k_blk, v_blk, bias_blk):
        # (B, H, N/n, D) -> (B, H/n, N, D)
        def seq_to_head(x):
            return jax.lax.all_to_all(
                x, axis_name, split_axis=1, concat_axis=2, tiled=True
            )

        def head_to_seq(x):
            return jax.lax.all_to_all(
                x, axis_name, split_axis=2, concat_axis=1, tiled=True
            )

        qh, kh, vh = seq_to_head(q_blk), seq_to_head(k_blk), seq_to_head(v_blk)
        bias_full = jax.lax.all_gather(bias_blk, axis_name, axis=1, tiled=True)
        if use_flash:
            out = flash_attention(qh, kh, vh, bias_full, sm_scale=sm_scale)
        else:
            out, _ = _attention_with_lse(qh, kh, vh, sm_scale, bias_full)
        return head_to_seq(out)

    spec = P(None, None, axis_name, None)
    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec, P(None, axis_name)),
        out_specs=spec,
        check_vma=False,  # pallas_call outputs carry no vma annotations
    )(q, k, v, bias)
