"""Measure MXU cost of attention-matmul operand layouts at the SD/XL head
dims (VERDICT r4 item 8: head_dim 40/64 pads to the 128-lane minimum in the
flash kernel — 3.2x/2x nominal FLOPs at the 64^2 sites).

The candidate fix is NOT "pack heads into lanes" (scores are per-head: lane-
packing either mixes heads' contributions or computes a block-diagonal score
matrix with MORE total MXU work). The candidate is a LAYOUT change: keep the
head dim in *sublanes* (8-granular) instead of *lanes* (128-granular) for the
two attention matmuls:

  scores:  S = Q K^T        — contraction over d
     A (current): dot((bq, d), (bk, d)) contracting d in lanes (pads to 128)
     B (dT):      dot((d, bq), (d, bk)) contracting d in sublanes (pads to 8)
  weighted: O = P V         — d is an output dim
     A (current): dot((bq, bk), (bk, d)) -> (bq, d) with d in lanes
     B (oT):      dot((d, bk), (bq, bk)) contracting bk -> (d, bq)

Measurement design notes (why this is NOT a naive host-timed dot loop):

* The flash kernel's score/PV matmuls run on VMEM-resident blocks; a
  standalone HBM-level dot at these shapes is bound by writing/reading the
  (N, N) score matrix (~2 GB f32), so it cannot answer the MXU-padding
  question.  The probe therefore runs INSIDE a Pallas kernel on VMEM blocks
  (bq = bk = 512, the production flash tile), looping the dot thousands of
  times with an i-dependent operand perturbation (defeats loop hoisting) and
  a carried accumulator (defeats dead-code elimination).
* Through the axon tunnel, async dispatch makes `block_until_ready` on the
  LAST of 50 independent enqueues unreliable (first version of this tool
  measured 10 PFLOP/s on a ~200 TFLOP/s chip).  The probe instead times ONE
  program at two in-kernel iteration counts and uses the SLOPE, which
  cancels dispatch/RTT constants exactly.
* The per-iteration accumulator reduction (jnp.sum over the (512, 512)
  score block, VPU work) is identical across layouts, so ratios remain
  valid even where it is not negligible; its absolute share is reported.

If B-layouts approach the d=128 roofline at d=40/64, a dT flash-kernel
variant is worth building; if Mosaic/MXU pads the sublane contraction to 128
anyway (or inserts layout-change copies that eat the win), the padding is a
hardware floor and the idea is withdrawn (recorded in BASELINE.md either
way, like the round-3 conv-kernel decision).

Run on the real chip: python tools/bench_attn_layouts.py
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

BQ = BK = 512  # production flash tile at the 64^2 sites


def _probe_kernel(a_ref, b_ref, o_ref, *, iters, dn):
    """acc += sum(dot(a', b')) for i in range(iters), perturbing whichever
    operand is SMALLER by an i-dependent scale (defeats loop hoisting at
    identical VPU overhead across the layouts being compared — perturbing
    the larger operand would bill one layout for extra elementwise work).
    The accumulated sum keeps every dot live.  One dot per iteration, dots
    mutually independent -> the MXU pipelines across iterations.
    """
    a = a_ref[...]
    b = b_ref[...]
    perturb_a = a.size <= b.size

    def body(i, acc):
        scale = 1.0 + 1e-9 * i
        ai = (a.astype(jnp.float32) * scale).astype(a.dtype) if perturb_a else a
        bi = b if perturb_a else (b.astype(jnp.float32) * scale).astype(b.dtype)
        s = jax.lax.dot_general(
            ai, bi, dimension_numbers=(dn, ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc + jnp.sum(s)

    acc = jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    o_ref[...] = jnp.full((8, 128), acc, jnp.float32)


def _probe(a, b, dn, iters):
    f = pl.pallas_call(
        functools.partial(_probe_kernel, iters=iters, dn=dn),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )
    jf = jax.jit(f)
    out = jf(a, b)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(jf(a, b))
        best = min(best, time.perf_counter() - t0)
    return best


# iteration counts sized so t_hi - t_lo is tens of ms of pure compute —
# the tunnel's per-dispatch RTT jitter is ~1 ms and must stay <5% of the
# slope signal
def probe_layout(a, b, dn, flops_per_iter, lo=16384, hi=131072):
    """Per-iteration seconds via the slope between two iteration counts
    (cancels dispatch + RTT constants)."""
    t_lo = _probe(a, b, dn, lo)
    t_hi = _probe(a, b, dn, hi)
    per_iter = (t_hi - t_lo) / (hi - lo)
    return per_iter, flops_per_iter / per_iter / 1e12


def main():
    rng = np.random.RandomState(0)
    results = {}
    for d in (40, 64, 128):
        q = jnp.asarray(rng.randn(BQ, d), jnp.bfloat16)
        k = jnp.asarray(rng.randn(BK, d), jnp.bfloat16)
        qT = jnp.asarray(np.ascontiguousarray(np.asarray(q, np.float32).T),
                         jnp.bfloat16)
        kT = jnp.asarray(np.ascontiguousarray(np.asarray(k, np.float32).T),
                         jnp.bfloat16)
        p = jnp.asarray(rng.randn(BQ, BK), jnp.bfloat16)
        v = jnp.asarray(rng.randn(BK, d), jnp.bfloat16)
        vT = jnp.asarray(np.ascontiguousarray(np.asarray(v, np.float32).T),
                         jnp.bfloat16)

        fl = 2 * BQ * BK * d
        # scores S = Q K^T
        s_lane = probe_layout(q, k, ((1,), (1,)), fl)      # d in lanes
        s_sub = probe_layout(qT, kT, ((0,), (0,)), fl)     # d in sublanes
        # weighted O = P V
        pv_lane = probe_layout(p, v, ((1,), (0,)), fl)     # d out in lanes
        pv_sub = probe_layout(vT, p, ((1,), (1,)), fl)     # d out in sublanes

        results[d] = dict(
            s_lane_us=s_lane[0] * 1e6, s_lane_tf=s_lane[1],
            s_sub_us=s_sub[0] * 1e6, s_sub_tf=s_sub[1],
            pv_lane_us=pv_lane[0] * 1e6, pv_lane_tf=pv_lane[1],
            pv_sub_us=pv_sub[0] * 1e6, pv_sub_tf=pv_sub[1],
        )
        r = results[d]
        print(
            f"d={d:4d}  scores lane {r['s_lane_us']:7.3f} us"
            f" ({r['s_lane_tf']:6.1f} TF/s)"
            f"  sub {r['s_sub_us']:7.3f} us ({r['s_sub_tf']:6.1f} TF/s)   "
            f"pv lane {r['pv_lane_us']:7.3f} us ({r['pv_lane_tf']:6.1f} TF/s)"
            f"  sub {r['pv_sub_us']:7.3f} us ({r['pv_sub_tf']:6.1f} TF/s)",
            flush=True,
        )

    # sanity anchor: the d=128 lane layout should land near the chip's bf16
    # peak; if it does not, the probe itself is suspect.
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
