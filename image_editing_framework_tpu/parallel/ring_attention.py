"""Context parallelism: ring attention over latent tokens.

The reference materializes full O(N^2) attention on one GPU, topping out at
SDXL's 16384-token self-attention (masactrl/model/register.py:35;
SURVEY.md §5 long-context note). For multi-chip scale-out this module shards
the *sequence* dimension across a mesh axis: each chip holds an N/n_dev slice
of Q/K/V, K/V blocks rotate around the ring via ``jax.lax.ppermute`` while
each chip accumulates blockwise-softmax partial results — communication
overlaps compute, and per-chip memory drops from O(N^2) scores (never
materialized anyway) and O(N) KV to O(N/n_dev).

Also provides the Ulysses-style alternative: all_to_all resharding
heads <-> sequence around a fully local attention — cheaper than the ring
when heads >= chips.

Partial results merge with the standard two-estimate log-sum-exp combine:
    m = max(lse1, lse2); w_i = exp(lse_i - m)
    out = (o1 w1 + o2 w2) / (w1 + w2);  lse = m + log(w1 + w2)
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def _attention_with_lse(q, k, v, sm_scale):
    """Blockwise attention returning (out, lse). XLA path (a Pallas variant
    plugs in transparently on TPU via flash_attention's lse output)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * sm_scale
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


def ring_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "data",
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Full self-attention with Q/K/V sequence-sharded over ``axis_name``.

    q/k/v: (B, H, N, D) global shapes; N must divide by the axis size.
    Returns (B, H, N, D) with the same sequence sharding.
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    n_dev = mesh.shape[axis_name]
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def local_fn(q_blk, k_blk, v_blk):
        out, lse = _attention_with_lse(q_blk, k_blk, v_blk, sm_scale)

        def body(_, carry):
            out, lse, kb, vb = carry
            # rotate KV to the next chip, then fold the received block in
            kb = jax.lax.ppermute(kb, axis_name, perm)
            vb = jax.lax.ppermute(vb, axis_name, perm)
            o_i, lse_i = _attention_with_lse(q_blk, kb, vb, sm_scale)
            out, lse = _merge(out, lse, o_i, lse_i)
            return out, lse, kb, vb

        out, lse, _, _ = jax.lax.fori_loop(
            0, n_dev - 1, body, (out, lse, k_blk, v_blk)
        )
        return out

    spec = P(None, None, axis_name, None)
    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )(q, k, v)


def ulysses_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "data",
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """All-to-all head<->sequence reshard around a fully local attention.

    Inputs arrive sequence-sharded (B, H, N, D); the all_to_all makes each
    chip hold ALL tokens for H/n_dev heads, attention runs locally with no
    ring steps, and a second all_to_all restores sequence sharding. Requires
    H % axis_size == 0.
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    n_dev = mesh.shape[axis_name]
    assert q.shape[1] % n_dev == 0, "Ulysses needs heads % devices == 0"

    def local_fn(q_blk, k_blk, v_blk):
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
        out, _ = _attention_with_lse(qh, kh, vh, sm_scale)
        return head_to_seq(out)

    spec = P(None, None, axis_name, None)
    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )(q, k, v)
