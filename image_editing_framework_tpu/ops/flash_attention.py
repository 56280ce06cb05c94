"""Fused flash attention for TPU (Pallas).

This is the compute path that replaces the reference's materialize-probs
attention (p2p/model/register.py:47-50, masactrl/model/register.py:35-48).
The editing methods never require materialized *self*-attention probabilities:

* MasaCtrl's mutual self-attention = target queries attend to the source
  element's K/V (masactrl/model/attention_control.py:59-66),
* P2P's self-replacement = target output uses the source's Q·K^T probs with
  its own V (p2p/model/attention_base.py:132-136),
* PnP's Q/K injection = the conditional-source Q/K replace both target
  branches' Q/K (pnp/model/register.py:41-52),

all of which reduce to **per-batch-element Q/K/V index remapping** before a
standard softmax(QK^T)V. The remap is a cheap XLA gather (bytes ~= one K/V
read, negligible vs the O(N^2) attention FLOPs); the attention itself runs in
this fused online-softmax kernel so the (N, N) score matrix never touches HBM.

Numerics: scores and softmax statistics in float32 regardless of input dtype.
Falls back to interpret mode off-TPU (tests run on the CPU backend).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, sm_scale, kv_len, block_k
):
    """Online-softmax attention tile. Grid: (BH, n_q, n_k)."""
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (bk, d)
    # For float32 inputs use multi-pass MXU multiplies (exact); bf16 inputs
    # take the native single-pass path.
    precision = (
        jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    s = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    s *= sm_scale

    # Mask padded KV rows (when kv_len is not a multiple of block_k).
    if kv_len % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_ref[...]  # (bq, 128) broadcast lanes
    l_prev = l_ref[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # (bq, 1)
    m_next = jnp.maximum(m_prev, m_cur)  # (bq, 128)
    alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])  # (bq, 1)
    p = jnp.exp(s - m_next[:, :1])
    l_ref[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[...] = m_next

    v = v_ref[0]  # (bk, d)
    pv = jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32, precision=precision
    )
    acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(ki == n_k - 1)
    def _store():
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[...] * jnp.where(l == 0.0, 1.0, 1.0 / l)).astype(
            o_ref.dtype
        )


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_q", "block_k"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    sm_scale: float | None = None,
    block_q: int = 256,
    block_k: int = 512,
) -> jnp.ndarray:
    """softmax(q k^T * scale) v with online softmax.

    Args:
      q: (B, H, Nq, D)
      k/v: (B, H, Nk, D)
    Returns:
      (B, H, Nq, D) in q.dtype.
    """
    b, h, nq, d = q.shape
    nk = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    # Pad head dim to the 128-lane layout (zero pads are exact: they add
    # nothing to QK^T and produce zero output tail which we slice off).
    dp = max(128, ((d + 127) // 128) * 128)
    if dp != d:
        q = _pad_to(q, 3, dp)
        k = _pad_to(k, 3, dp)
        v = _pad_to(v, 3, dp)

    bq = min(block_q, nq)
    bk = min(block_k, nk)
    nk_pad = ((nk + bk - 1) // bk) * bk
    if nk_pad != nk:
        k = _pad_to(k, 2, bk)
        v = _pad_to(v, 2, bk)
    assert nq % bq == 0, (nq, bq)

    qf = q.reshape(b * h, nq, dp)
    kf = k.reshape(b * h, nk_pad, dp)
    vf = v.reshape(b * h, nk_pad, dp)

    grid = (b * h, nq // bq, nk_pad // bk)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, sm_scale=sm_scale, kv_len=nk, block_k=bk
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, dp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, bk, dp), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, bk, dp), lambda bh, qi, ki: (bh, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda bh, qi, ki: (bh, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(qf, kf, vf)

    out = out.reshape(b, h, nq, dp)
    if dp != d:
        out = out[..., :d]
    return out


def reference_attention(q, k, v, sm_scale=None):
    """Explicit O(N^2) attention (float32 softmax) — correctness oracle and
    differentiable fallback for gradient paths (NTI, pix2pix-zero pass 2)."""
    d = q.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    s = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=jax.lax.Precision.HIGHEST)
        .astype(jnp.float32)
        * sm_scale
    )
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, precision=jax.lax.Precision.HIGHEST
    )
