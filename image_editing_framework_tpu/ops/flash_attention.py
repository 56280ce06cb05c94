"""Fused flash attention for TPU (Pallas), forward + custom VJP.

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

The backward pass (needed by null-text inversion's Adam loop,
p2p/inversion/nti.py:23-29, and pix2pix-zero's latent SGD,
pix2pix-zero/model/sd_utils.py:157-174) follows the standard flash recipe:
the forward saves only the per-row log-sum-exp; two kernels recompute
probability tiles on the fly — dQ iterating KV tiles, dK/dV iterating Q
tiles — with di = sum(o * do) precomputed once. At head_dim <= 64 and
query length >= 4096 (a measured threshold, tools/bench_flash_bwd_t.py)
the no-bias backward uses transposed-layout kernels (_bwd_dq_kernel_t /
_bwd_dkv_kernel_t): the dQ/dK/dV accumulations land head_dim in 8-granular
sublanes instead of the MXU's 128-padded lanes, the same layout win as the
forward's _fwd_kernel_t (BASELINE.md, "Attention-matmul operand layouts").

Numerics: scores and softmax statistics in float32 regardless of input dtype;
float32 inputs use exact multi-pass MXU multiplies, bfloat16 the native
single-pass path. Falls back to interpret mode off-TPU.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _precision(dtype):
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ---------------------------------------------------------------------------
# forward


def _fwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, sm_scale, kv_len, block_k, has_bias,
):
    """Online-softmax attention tile. Grid: (BH, n_q, n_k)."""
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (bk, d)
    precision = _precision(q.dtype)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    s *= sm_scale
    if has_bias:  # additive per-key logit bias (segment masks); the add on
        # the (bq, bk) f32 scores costs ~15% of kernel time at 4096 tokens,
        # so the no-bias majority path compiles it out.
        s += bias_ref[0, 0][None, :]

    # Mask padded KV rows (when kv_len is not a multiple of block_k).
    if kv_len % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[...]  # (bq, 128) broadcast lanes
    l_prev = l_scr[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # (bq, 1)
    m_next = jnp.maximum(m_prev, m_cur)  # (bq, 128)
    alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])  # (bq, 1)
    p = jnp.exp(s - m_next[:, :1])
    l_scr[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    m_scr[...] = m_next

    v = v_ref[0]  # (bk, d)
    pv = jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32,
        precision=precision,
    )
    acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(ki == n_k - 1)
    def _store():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[...] * jnp.where(l == 0.0, 1.0, 1.0 / l)).astype(
            o_ref.dtype
        )
        if lse_ref is not None:
            lse_ref[0, 0, :] = (
                m_scr[:, 0] + jnp.log(jnp.maximum(l_scr[:, 0], 1e-37))
            )


def _fwd_kernel_nolse(
    q_ref, k_ref, v_ref, bias_ref, o_ref, m_scr, l_scr, acc_scr,
    *, sm_scale, kv_len, block_k, has_bias,
):
    _fwd_kernel(
        q_ref, k_ref, v_ref, bias_ref, o_ref, None, m_scr, l_scr, acc_scr,
        sm_scale=sm_scale, kv_len=kv_len, block_k=block_k, has_bias=has_bias,
    )


def _fwd_impl(qf, kf, vf, biasf, sm_scale, bq, bk, kv_len, has_bias=True,
              want_lse=True):
    # want_lse=False drops the log-sum-exp output stream entirely: the
    # inference-only primal (the 50-step edit loops) never reads it, and the
    # second output stream costs measurable kernel time at 4096 tokens.
    bh, nq, dp = qf.shape
    nk_pad = kf.shape[1]
    grid = (bh, nq // bq, nk_pad // bk)
    in_specs = [
        pl.BlockSpec((1, bq, dp), lambda b, qi, ki: (b, qi, 0)),
        pl.BlockSpec((1, bk, dp), lambda b, qi, ki: (b, ki, 0)),
        pl.BlockSpec((1, bk, dp), lambda b, qi, ki: (b, ki, 0)),
        pl.BlockSpec((1, 1, bk), lambda b, qi, ki: (b, 0, ki)),
    ]
    scratch = [
        pltpu.VMEM((bq, 128), jnp.float32),
        pltpu.VMEM((bq, 128), jnp.float32),
        pltpu.VMEM((bq, dp), jnp.float32),
    ]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )
    if not want_lse:
        out = pl.pallas_call(
            functools.partial(
                _fwd_kernel_nolse, sm_scale=sm_scale, kv_len=kv_len,
                block_k=bk, has_bias=has_bias,
            ),
            out_shape=jax.ShapeDtypeStruct((bh, nq, dp), qf.dtype),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bq, dp), lambda b, qi, ki: (b, qi, 0)),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=_interpret(),
        )(qf, kf, vf, biasf)
        return out, None
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, sm_scale=sm_scale, kv_len=kv_len, block_k=bk,
            has_bias=has_bias,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, nq, dp), qf.dtype),
            jax.ShapeDtypeStruct((bh, 1, nq), jnp.float32),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, bq, dp), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, qi, ki: (b, 0, qi)),
        ),
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=_interpret(),
    )(qf, kf, vf, biasf)
    return out, lse


def _fwd_kernel_t(
    q_ref, k_ref, vt_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, sm_scale, kv_len, block_k,
):
    """Transposed-layout online-softmax tile (no-bias inference path).

    At head_dim 40 (SD) / 64 (XL) the classic layout pads d to the MXU's
    128-lane minimum in the P·V matmul's output (3.2x / 2x nominal FLOPs).
    This variant computes Sᵀ = K·Qᵀ — so the softmax statistics are
    *lane-major* (1, bq) for free — and accumulates Oᵀ = Vᵀ·Pᵀ as a
    standard (d, bk)@(bk, bq) matmul: d lives in 8-granular sublanes, bk
    stays in well-aligned lanes, and no per-step relayouts are needed.
    Measured on v5e (tools/bench_attn_layouts.py): the PV matmul runs
    1.40x faster at d=40 and 1.35x at d=64; the scores matmul is
    unchanged (its lane padding is a hardware floor either way).
    Grid: (BH, n_q, n_k); V arrives pre-transposed (BH, d8, Nk) and the
    output leaves as (BH, d8, Nq) — the caller swaps axes outside (an XLA
    copy over O's ~bytes, negligible vs the O(N²) kernel).
    """
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (bq, dp)
    k = k_ref[0]  # (bk, dp)
    precision = _precision(q.dtype)
    s = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # (bk, bq) — scores transposed
    s *= sm_scale

    if kv_len % block_k != 0:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + ki * block_k
        s = jnp.where(row < kv_len, s, NEG_INF)

    m_prev = m_scr[...]  # (8, bq) lane-major, sublanes broadcast
    l_prev = l_scr[...]
    m_cur = jnp.max(s, axis=0, keepdims=True)  # (1, bq)
    m_next = jnp.maximum(m_prev, m_cur)  # (8, bq)
    alpha = jnp.exp(m_prev[:1] - m_next[:1])  # (1, bq)
    p = jnp.exp(s - m_next[:1])  # (bk, bq)
    l_scr[...] = alpha * l_prev + jnp.sum(p, axis=0, keepdims=True)
    m_scr[...] = m_next

    vt = vt_ref[0]  # (d8, bk)
    pv = jax.lax.dot(
        vt, p.astype(vt.dtype), preferred_element_type=jnp.float32,
        precision=precision,
    )  # (d8, bq)
    acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(ki == n_k - 1)
    def _store():
        l = l_scr[:1]
        o_ref[0] = (acc_scr[...] * jnp.where(l == 0.0, 1.0, 1.0 / l)).astype(
            o_ref.dtype
        )
        if lse_ref is not None:
            # stats are already lane-major here — no relayout, unlike the
            # classic kernel's m_scr[:, 0] sublane extraction
            lse_ref[0, 0, :] = (
                m_scr[0] + jnp.log(jnp.maximum(l_scr[0], 1e-37))
            )


def _fwd_kernel_t_nolse(
    q_ref, k_ref, vt_ref, o_ref, m_scr, l_scr, acc_scr,
    *, sm_scale, kv_len, block_k,
):
    _fwd_kernel_t(
        q_ref, k_ref, vt_ref, o_ref, None, m_scr, l_scr, acc_scr,
        sm_scale=sm_scale, kv_len=kv_len, block_k=block_k,
    )


def _fwd_impl_t(qf, kf, vtf, sm_scale, bq, bk, kv_len, want_lse=False):
    bh, nq, dp = qf.shape
    d8 = vtf.shape[1]
    nk_pad = kf.shape[1]
    grid = (bh, nq // bq, nk_pad // bk)
    in_specs = [
        pl.BlockSpec((1, bq, dp), lambda b, qi, ki: (b, qi, 0)),
        pl.BlockSpec((1, bk, dp), lambda b, qi, ki: (b, ki, 0)),
        pl.BlockSpec((1, d8, bk), lambda b, qi, ki: (b, 0, ki)),
    ]
    scratch = [
        pltpu.VMEM((8, bq), jnp.float32),
        pltpu.VMEM((8, bq), jnp.float32),
        pltpu.VMEM((d8, bq), jnp.float32),
    ]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )
    if not want_lse:
        out = pl.pallas_call(
            functools.partial(
                _fwd_kernel_t_nolse, sm_scale=sm_scale, kv_len=kv_len,
                block_k=bk,
            ),
            out_shape=jax.ShapeDtypeStruct((bh, d8, nq), qf.dtype),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, d8, bq), lambda b, qi, ki: (b, 0, qi)),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=_interpret(),
        )(qf, kf, vtf)
        return out, None
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel_t, sm_scale=sm_scale, kv_len=kv_len, block_k=bk,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, d8, nq), qf.dtype),
            jax.ShapeDtypeStruct((bh, 1, nq), jnp.float32),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, d8, bq), lambda b, qi, ki: (b, 0, qi)),
            pl.BlockSpec((1, 1, bq), lambda b, qi, ki: (b, 0, qi)),
        ),
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=_interpret(),
    )(qf, kf, vtf)
    return out, lse


def _use_t_layout(d: int) -> bool:
    # measured on v5e (tools/bench_flash_t.py): 1.27x at d=40 (SD 64² sites),
    # 1.11x at d=64 (XL res-32), but 0.97x at d=80 and parity at d=128 —
    # the sublane layout only pays while the lane padding it removes is
    # >=2x. Killswitch for A/B measurement and emergencies.
    return d <= 64 and os.environ.get("IEF_FLASH_T", "1") != "0"


def _prep_t(q, k, v, block_q, block_k):
    """Like _prep, but V is padded to 8-granular head dim and transposed to
    (BH, d8, Nk) for the sublane-major accumulator."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    dp = max(128, ((d + 127) // 128) * 128)
    if dp != d:
        q = _pad_to(q, 3, dp)
        k = _pad_to(k, 3, dp)
    d8 = ((d + 7) // 8) * 8
    if d8 != d:
        v = _pad_to(v, 3, d8)
    bq = min(block_q, nq)
    bk = min(block_k, nk)
    nk_pad = ((nk + bk - 1) // bk) * bk
    if nk_pad != nk:
        k = _pad_to(k, 2, bk)
        v = _pad_to(v, 2, bk)
    assert nq % bq == 0, (nq, bq)
    qf = q.reshape(b * h, nq, dp)
    kf = k.reshape(b * h, nk_pad, dp)
    vtf = jnp.swapaxes(v, 2, 3).reshape(b * h, d8, nk_pad)
    return qf, kf, vtf, (b, h, nq, nk, d, d8, bq, bk)


def _untranspose_t(xt, b, h, d, n=None):
    """Transposed-kernel output (BH, d8, N) -> standard (B, H, n, d).

    Drops the 8-granular head-dim padding; ``n`` additionally slices the
    sequence axis back to its unpadded length (dK/dV outputs, whose key
    axis was padded to the block size)."""
    x = jnp.swapaxes(xt.reshape(b, h, xt.shape[1], -1), 2, 3)[..., :d]
    return x if n is None else x[:, :, :n]


# ---------------------------------------------------------------------------
# backward


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, di_ref, dq_ref, acc_scr,
    *, sm_scale, kv_len, block_k, has_bias,
):
    """dQ = (P * (dO V^T - di)) K * scale, accumulated over KV tiles.
    Grid: (BH, n_q, n_k)."""
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    precision = _precision(q.dtype)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) * sm_scale
    if has_bias:
        s += bias_ref[0, 0][None, :]
    if kv_len % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0, 0][:, None])  # (bq, bk)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # (bq, bk)
    ds = p * (dp - di_ref[0, 0][:, None]) * sm_scale
    acc_scr[...] += jax.lax.dot(
        ds.astype(k.dtype), k, preferred_element_type=jnp.float32,
        precision=precision,
    )

    @pl.when(ki == n_k - 1)
    def _store():
        dq_ref[0] = acc_scr[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref,
    dk_scr, dv_scr, *, sm_scale, has_bias,
):
    """dV = P^T dO;  dK = (P * (dO V^T - di))^T Q * scale.
    Grid: (BH, n_k, n_q) — Q tiles innermost."""
    qi = pl.program_id(2)
    n_q = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    precision = _precision(q.dtype)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) * sm_scale
    if has_bias:
        s += bias_ref[0, 0][None, :]
    p = jnp.exp(s - lse_ref[0, 0][:, None])  # (bq, bk)
    dv_scr[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # (bk, d)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    ds = p * (dp - di_ref[0, 0][:, None]) * sm_scale  # (bq, bk)
    dk_scr[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # (bk, d)

    @pl.when(qi == n_q - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_impl(qf, kf, vf, biasf, of, do_f, lse, sm_scale, bq, bk, kv_len,
              has_bias=True):
    bh, nq, dp = qf.shape
    nk_pad = kf.shape[1]
    di = jnp.sum(of.astype(jnp.float32) * do_f.astype(jnp.float32), axis=-1)[:, None, :]  # (bh, 1, nq)

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, sm_scale=sm_scale, kv_len=kv_len, block_k=bk,
            has_bias=has_bias,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, nq, dp), qf.dtype),
        grid=(bh, nq // bq, nk_pad // bk),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bk, dp), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bk, dp), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, 1, bk), lambda b, qi, ki: (b, 0, ki)),
            pl.BlockSpec((1, bq, dp), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, qi, ki: (b, 0, qi)),
            pl.BlockSpec((1, 1, bq), lambda b, qi, ki: (b, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda b, qi, ki: (b, qi, 0)),
        scratch_shapes=[pltpu.VMEM((bq, dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(qf, kf, vf, biasf, do_f, lse, di)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, sm_scale=sm_scale, has_bias=has_bias
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, nk_pad, dp), kf.dtype),
            jax.ShapeDtypeStruct((bh, nk_pad, dp), vf.dtype),
        ),
        grid=(bh, nk_pad // bk, nq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, bk, dp), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, bk, dp), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, 1, bk), lambda b, ki, qi: (b, 0, ki)),
            pl.BlockSpec((1, bq, dp), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, ki, qi: (b, 0, qi)),
            pl.BlockSpec((1, 1, bq), lambda b, ki, qi: (b, 0, qi)),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, dp), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, bk, dp), lambda b, ki, qi: (b, ki, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, dp), jnp.float32),
            pltpu.VMEM((bk, dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(qf, kf, vf, biasf, do_f, lse, di)
    return dq, dk, dv


def _bwd_dq_kernel_t(
    q_ref, k_ref, v_ref, kt_ref, do_ref, lse_ref, di_ref, dqt_ref, acc_scr,
    *, sm_scale, kv_len, block_k,
):
    """Transposed-layout dQ: dQᵀ = Kᵀ·dSᵀ, accumulated over KV tiles.

    The classic dq accumulation ds·K puts head_dim in the output's lane
    dimension — padded to the MXU's 128-lane minimum at d=40/64 (the same
    3.2×/2× nominal-FLOP waste the forward's P·V had before _fwd_kernel_t).
    Here scores are computed as Sᵀ = K·Qᵀ (softmax stats lane-major for
    free, matching the (BH, 1, Nq) lse/di streams with zero relayout),
    dPᵀ = V·dOᵀ keeps the contraction in lanes (that padding is a hardware
    floor either way — see BASELINE.md's layout probe), and the dQ
    accumulation becomes Kᵀ(d8,bk)·dSᵀ(bk,bq) → (d8,bq): d in 8-granular
    sublanes, no 128-lane padding. K arrives a second time pre-transposed
    (an XLA copy over K's bytes, negligible vs the O(N²) kernel).
    Grid: (BH, n_q, n_k)."""
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    precision = _precision(q.dtype)
    st = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) * sm_scale  # (bk, bq) — scores transposed
    if kv_len % block_k != 0:
        row = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0) + ki * block_k
        st = jnp.where(row < kv_len, st, NEG_INF)
    pt = jnp.exp(st - lse_ref[0, 0][None, :])  # (bk, bq)
    dpt = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # (bk, bq)
    dst = pt * (dpt - di_ref[0, 0][None, :]) * sm_scale
    kt = kt_ref[0]  # (d8, bk)
    acc_scr[...] += jax.lax.dot(
        kt, dst.astype(kt.dtype), preferred_element_type=jnp.float32,
        precision=precision,
    )  # (d8, bq)

    @pl.when(ki == n_k - 1)
    def _store():
        dqt_ref[0] = acc_scr[...].astype(dqt_ref.dtype)


def _bwd_dkv_kernel_t(
    q_ref, k_ref, v_ref, qt_ref, do_ref, dot_ref, lse_ref, di_ref,
    dkt_ref, dvt_ref, dkt_scr, dvt_scr, *, sm_scale,
):
    """Transposed-layout dK/dV: dVᵀ = dOᵀ·P, dKᵀ = Qᵀ·dS — both outputs
    (d8, bk) with head_dim in sublanes instead of 128-padded lanes. Q and
    dO each arrive twice (standard layout for the lane-contracted Sᵀ/dPᵀ
    products, pre-transposed (d8, bq) for the accumulations) — ~16% more
    input bytes at the 4096-token hot shape, repaying >1.3× on two of the
    four matmuls. Grid: (BH, n_k, n_q) — Q tiles innermost."""
    qi = pl.program_id(2)
    n_q = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dkt_scr[...] = jnp.zeros_like(dkt_scr)
        dvt_scr[...] = jnp.zeros_like(dvt_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    precision = _precision(q.dtype)
    st = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) * sm_scale  # (bk, bq)
    pt = jnp.exp(st - lse_ref[0, 0][None, :])  # (bk, bq)
    dot_t = dot_ref[0]  # (d8, bq)
    dvt_scr[...] += jax.lax.dot_general(
        dot_t, pt.astype(dot_t.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # (d8, bk)
    dpt = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # (bk, bq)
    dst = pt * (dpt - di_ref[0, 0][None, :]) * sm_scale
    qt = qt_ref[0]  # (d8, bq)
    dkt_scr[...] += jax.lax.dot_general(
        qt, dst.astype(qt.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # (d8, bk)

    @pl.when(qi == n_q - 1)
    def _store():
        dkt_ref[0] = dkt_scr[...].astype(dkt_ref.dtype)
        dvt_ref[0] = dvt_scr[...].astype(dvt_ref.dtype)


def _bwd_impl_t(qf, kf, vf, of, do_f, lse, sm_scale, bq, bk, kv_len, d8):
    """No-bias backward in the transposed layout. Returns (dQᵀ, dKᵀ, dVᵀ)
    as (BH, d8, N) — the caller swaps axes back outside the kernels."""
    bh, nq, dp = qf.shape
    nk_pad = kf.shape[1]
    di = jnp.sum(
        of.astype(jnp.float32) * do_f.astype(jnp.float32), axis=-1
    )[:, None, :]  # (bh, 1, nq)
    ktf = jnp.swapaxes(kf, 1, 2)[:, :d8]    # (bh, d8, nk_pad); rows d..d8 are
    qtf = jnp.swapaxes(qf, 1, 2)[:, :d8]    # the zero padding _prep added
    dotf = jnp.swapaxes(do_f, 1, 2)[:, :d8]

    dqt = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel_t, sm_scale=sm_scale, kv_len=kv_len, block_k=bk,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, d8, nq), qf.dtype),
        grid=(bh, nq // bq, nk_pad // bk),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bk, dp), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bk, dp), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, d8, bk), lambda b, qi, ki: (b, 0, ki)),
            pl.BlockSpec((1, bq, dp), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, qi, ki: (b, 0, qi)),
            pl.BlockSpec((1, 1, bq), lambda b, qi, ki: (b, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, d8, bq), lambda b, qi, ki: (b, 0, qi)),
        scratch_shapes=[pltpu.VMEM((d8, bq), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(qf, kf, vf, ktf, do_f, lse, di)

    dkt, dvt = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_t, sm_scale=sm_scale),
        out_shape=(
            jax.ShapeDtypeStruct((bh, d8, nk_pad), kf.dtype),
            jax.ShapeDtypeStruct((bh, d8, nk_pad), vf.dtype),
        ),
        grid=(bh, nk_pad // bk, nq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, bk, dp), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, bk, dp), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, d8, bq), lambda b, ki, qi: (b, 0, qi)),
            pl.BlockSpec((1, bq, dp), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, d8, bq), lambda b, ki, qi: (b, 0, qi)),
            pl.BlockSpec((1, 1, bq), lambda b, ki, qi: (b, 0, qi)),
            pl.BlockSpec((1, 1, bq), lambda b, ki, qi: (b, 0, qi)),
        ],
        out_specs=(
            pl.BlockSpec((1, d8, bk), lambda b, ki, qi: (b, 0, ki)),
            pl.BlockSpec((1, d8, bk), lambda b, ki, qi: (b, 0, ki)),
        ),
        scratch_shapes=[
            pltpu.VMEM((d8, bk), jnp.float32),
            pltpu.VMEM((d8, bk), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(qf, kf, vf, qtf, do_f, dotf, lse, di)
    return dqt, dkt, dvt


def _use_bwd_t_layout(d: int, nq: int) -> bool:
    # the backward rides the transposed layout for d <= 64 AND long query
    # sequences only: measured on v5e (tools/bench_flash_bwd_t.py), fwd+bwd
    # is 1.11x at the 4096-token shapes (SD 64² d=40, XL res-64 d=64) but
    # 0.68-0.92x at XL res-32's 1024 tokens and neutral at 2048 — the T
    # backward's extra operand streams (K, Q, dO each arrive twice) only
    # repay above ~4k tokens. IEF_FLASH_BWD_T: "0" = off, "1" = force on
    # (correctness tests at tiny shapes), unset = this auto rule
    # (IEF_FLASH_T=0 disables both layouts regardless).
    if not _use_t_layout(d):
        return False
    env = os.environ.get("IEF_FLASH_BWD_T")
    if env is not None:
        return env != "0"
    return nq >= 4096


# ---------------------------------------------------------------------------
# public API with custom VJP


def _prep(q, k, v, bias, block_q, block_k):
    b, h, nq, d = q.shape
    nk = k.shape[2]
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
    # bias: (B, Nk) per-key logit bias, broadcast over heads -> (BH, 1, Nk).
    biasf = jnp.broadcast_to(
        _pad_to(bias.astype(jnp.float32), 1, bk)[:, None, :], (b, h, nk_pad)
    ).reshape(b * h, 1, nk_pad)
    return qf, kf, vf, biasf, (b, h, nq, nk, d, dp, bq, bk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash(q, k, v, bias, sm_scale, block_q, block_k, has_bias=True):
    if not has_bias and _use_t_layout(q.shape[-1]):
        # inference primal in the transposed layout: ~1.4x on the P·V
        # matmul at head_dim 40/64 (see _fwd_kernel_t). The differentiable
        # path (_flash_fwd/_flash_bwd) rides the same layout end to end.
        qf, kf, vtf, (b, h, nq, nk, d, d8, bq, bk) = _prep_t(
            q, k, v, block_q, block_k
        )
        out_t, _ = _fwd_impl_t(qf, kf, vtf, sm_scale, bq, bk, nk)
        return _untranspose_t(out_t, b, h, d)
    qf, kf, vf, biasf, (b, h, nq, nk, d, dp, bq, bk) = _prep(
        q, k, v, bias, block_q, block_k
    )
    out, _ = _fwd_impl(
        qf, kf, vf, biasf, sm_scale, bq, bk, nk, has_bias, want_lse=False
    )
    return out.reshape(b, h, nq, dp)[..., :d]


def _flash_fwd(q, k, v, bias, sm_scale, block_q, block_k, has_bias=True):
    qf, kf, vf, biasf, (b, h, nq, nk, d, dp, bq, bk) = _prep(
        q, k, v, bias, block_q, block_k
    )
    if not has_bias and _use_t_layout(d):
        # differentiable forward in the transposed layout (the T kernel
        # emits lse from its lane-major stats at no cost); the backward
        # kernels recompute probability tiles from q/k/lse themselves, so
        # the residual `out` only feeds di = sum(o * do) — re-padding it to
        # the classic (bh, nq, dp) residual layout is one cheap XLA copy.
        _, _, vtf, (_, _, _, _, _, d8, bqt, bkt) = _prep_t(
            q, k, v, block_q, block_k
        )
        out_t, lse = _fwd_impl_t(qf, kf, vtf, sm_scale, bqt, bkt, nk,
                                 want_lse=True)
        out_c = jnp.swapaxes(out_t, 1, 2)  # (bh, nq, d8)
        out = _pad_to(out_c, 2, dp) if dp != d8 else out_c
        res = (qf, kf, vf, biasf, out, lse, (b, h, nq, nk, d, dp, bq, bk))
        return out_c.reshape(b, h, nq, d8)[..., :d], res
    out, lse = _fwd_impl(qf, kf, vf, biasf, sm_scale, bq, bk, nk, has_bias)
    res = (qf, kf, vf, biasf, out, lse, (b, h, nq, nk, d, dp, bq, bk))
    return out.reshape(b, h, nq, dp)[..., :d], res


def _flash_bwd(sm_scale, block_q, block_k, has_bias, res, g):
    qf, kf, vf, biasf, of, lse, (b, h, nq, nk, d, dp, bq, bk) = res
    do = _pad_to(g, 3, dp) if dp != d else g
    do_f = do.reshape(b * h, nq, dp).astype(qf.dtype)
    # Bias is a mask schedule, not a learned quantity: zero cotangent.
    dbias = jnp.zeros((b, nk), jnp.float32)
    if not has_bias and _use_bwd_t_layout(d, nq):
        d8 = ((d + 7) // 8) * 8
        dqt, dkt, dvt = _bwd_impl_t(
            qf, kf, vf, of, do_f, lse, sm_scale, bq, bk, nk, d8
        )
        dq = _untranspose_t(dqt, b, h, d)
        dk = _untranspose_t(dkt, b, h, d, nk)
        dv = _untranspose_t(dvt, b, h, d, nk)
        return dq, dk, dv, dbias
    dq, dk, dv = _bwd_impl(qf, kf, vf, biasf, of, do_f, lse, sm_scale, bq, bk,
                           nk, has_bias)
    dq = dq.reshape(b, h, nq, dp)[..., :d]
    dk = dk.reshape(b, h, -1, dp)[:, :, :nk, :d]
    dv = dv.reshape(b, h, -1, dp)[:, :, :nk, :d]
    return dq, dk, dv, dbias


_flash.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_q", "block_k"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    sm_scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
) -> jnp.ndarray:
    """softmax(q k^T * scale + bias) v with online softmax; differentiable.

    Args:
      q: (B, H, Nq, D)
      k/v: (B, H, Nk, D)
      bias: optional (B, Nk) per-key logit bias (segment / spatial masks),
        broadcast over heads and queries; NEG_INF disables a key.
      block_q/block_k: tile sizes; default adapts to sequence length
        (measured on v5e: 1024/1024 wins at >=4096 tokens, 256/512 below).
    Returns:
      (B, H, Nq, D) in q.dtype.
    """
    sm_scale, block_q, block_k = _defaults(q, k, sm_scale, block_q, block_k)
    has_bias = bias is not None
    if bias is None:
        # placeholder for stable pytree/spec shapes; the kernels compile the
        # add out entirely when has_bias=False.
        bias = jnp.zeros((q.shape[0], k.shape[2]), jnp.float32)
    return _flash(q, k, v, bias, sm_scale, block_q, block_k, has_bias)


def _defaults(q, k, sm_scale, block_q, block_k):
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    # 1024/1024 at >=4096 tokens matches 2048-query tiles in-scan (41.1 vs
    # 41.4 ms/fwd on v5e SD batch-4) while staying comfortably inside the
    # 16 MB scoped-VMEM budget — 2048 tiles sat within 2% of the limit and
    # overflowed under vmap (batched sweep) and alongside the lse output.
    if block_q is None:
        block_q = 1024 if q.shape[2] >= 4096 else 256
    if block_k is None:
        block_k = 1024 if k.shape[2] >= 4096 else 512
    return sm_scale, block_q, block_k


def flash_attention_fwd_lse(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    sm_scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
):
    """Kernel forward returning (out, lse) — the building block for ring
    context parallelism (the per-chip partial results merge with the
    two-estimate log-sum-exp combine). NOT differentiable on its own; the
    ring wraps it in its own custom VJP (parallel/ring_attention.py).

    Returns out (B, H, Nq, D) and lse (B, H, Nq) float32.
    """
    sm_scale, block_q, block_k = _defaults(q, k, sm_scale, block_q, block_k)
    has_bias = bias is not None
    if not has_bias and _use_t_layout(q.shape[-1]):
        # ring/Ulysses CP inference local step in the transposed layout —
        # the lse merge math downstream is layout-agnostic (same global
        # quantity), and the ring VJP's classic recompute consumes it as-is.
        qf, kf, vtf, (b, h, nq, nk, d, d8, bq, bk) = _prep_t(
            q, k, v, block_q, block_k
        )
        out_t, lse = _fwd_impl_t(qf, kf, vtf, sm_scale, bq, bk, nk,
                                 want_lse=True)
        out = _untranspose_t(out_t, b, h, d)
        return out, lse.reshape(b, h, nq)
    if bias is None:
        bias = jnp.zeros((q.shape[0], k.shape[2]), jnp.float32)
    qf, kf, vf, biasf, (b, h, nq, nk, d, dp, bq, bk) = _prep(
        q, k, v, bias, block_q, block_k
    )
    out, lse = _fwd_impl(qf, kf, vf, biasf, sm_scale, bq, bk, nk, has_bias)
    return out.reshape(b, h, nq, dp)[..., :d], lse.reshape(b, h, nq)


def flash_attention_bwd_block(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None,
    out: jnp.ndarray,
    g: jnp.ndarray,
    lse: jnp.ndarray,
    sm_scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
):
    """Kernel backward against ONE KV block, given the *global* softmax
    statistics: ``out`` is the final (fully merged) attention output, ``g``
    its cotangent, ``lse`` the global log-sum-exp (B, H, Nq). With global
    lse, exp(s - lse) is each key's true global probability, so summing this
    block-wise backward over all KV blocks reproduces the exact full-sequence
    gradient (the ring-attention backward recipe).

    Returns (dq, dk, dv) for this block.
    """
    sm_scale, block_q, block_k = _defaults(q, k, sm_scale, block_q, block_k)
    has_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((q.shape[0], k.shape[2]), jnp.float32)
    qf, kf, vf, biasf, (b, h, nq, nk, d, dp, bq, bk) = _prep(
        q, k, v, bias, block_q, block_k
    )
    of = (_pad_to(out, 3, dp) if dp != d else out).reshape(b * h, nq, dp)
    do_f = (_pad_to(g, 3, dp) if dp != d else g).reshape(b * h, nq, dp).astype(qf.dtype)
    lse_f = lse.reshape(b * h, 1, nq).astype(jnp.float32)
    if not has_bias and _use_bwd_t_layout(d, nq):
        # the ring backward's per-block kernel grads ride the transposed
        # layout too — with global lse, exp(Sᵀ - lse) is already each key's
        # true global probability, layout-independent. nq here is the
        # per-chip local block length, so short CP shards keep the classic
        # kernels per the same measured threshold.
        d8 = ((d + 7) // 8) * 8
        dqt, dkt, dvt = _bwd_impl_t(
            qf, kf, vf, of, do_f, lse_f, sm_scale, bq, bk, nk, d8
        )
        dq = _untranspose_t(dqt, b, h, d)
        dk = _untranspose_t(dkt, b, h, d, nk)
        dv = _untranspose_t(dvt, b, h, d, nk)
        return dq, dk, dv
    dq, dk, dv = _bwd_impl(qf, kf, vf, biasf, of, do_f, lse_f, sm_scale, bq, bk,
                           nk, has_bias)
    dq = dq.reshape(b, h, nq, dp)[..., :d]
    dk = dk.reshape(b, h, -1, dp)[:, :, :nk, :d]
    dv = dv.reshape(b, h, -1, dp)[:, :, :nk, :d]
    return dq, dk, dv


def reference_attention(q, k, v, sm_scale=None):
    """Explicit O(N^2) attention (float32 softmax) — correctness oracle and
    differentiable fallback used by the XLA attention path."""
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
