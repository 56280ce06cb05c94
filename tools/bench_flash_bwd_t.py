"""Kernel-level A/B of the transposed-layout flash BACKWARD
(IEF_FLASH_BWD_T) at the production gradient shapes, on the real chip.

The backward's hot sites are null-text inversion's inner Adam iterations
(CFG-batch-2 fwd+bwd through the 64² self-attention, reference
p2p/inversion/nti.py:23-29) and pix2pix-zero's latent SGD
(pix2pix-zero/model/sd_utils.py:157-174).

Timing: N chained fwd+bwd invocations inside ONE jitted scan (each
iteration's Q is perturbed by the previous iteration's gradient scalar so
the chain cannot be reordered or elided), one host sync at the end; the
slope between two chain lengths cancels the tunnel's fetch RTT (see
tools/bench_flash_t.py for why naive timing lies through the axon tunnel).

Run: python tools/bench_flash_bwd_t.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _chained(iters):
    from image_editing_framework_tpu.ops.flash_attention import flash_attention

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v).astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def run(q, k, v):
        def body(acc, _):
            qi = q * (1.0 + 1e-12 * acc).astype(q.dtype)
            dq, dk, dv = grad(qi, k, v)
            return dq[0, 0, 0, 0].astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return acc

    return run


def time_fwdbwd(q, k, v, lo=10, hi=60):
    def timed(n):
        f = _chained(n)
        float(f(q, k, v))  # warm compile + execute
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(q, k, v))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(hi) - timed(lo)) / (hi - lo)


def main():
    shapes = {
        # NTI inner Adam iteration: CFG batch 2, SD 64^2 sites, d=40
        "nti_sd15_res64": (2, 8, 4096, 40),
        # p2z guided pass: CFG batch 2 per image, SD 64^2 sites
        # (same shape class as NTI; kept for labeling parity)
        # XL NTI at res-32 (d=64, 10-layer stacks)
        "nti_xl_res32": (2, 10, 1024, 64),
        # XL res-64 2-layer stacks: 4096 tok at d=64
        "nti_xl_res64": (2, 10, 4096, 64),
    }
    results = {}
    for name, (b, h, n, d) in shapes.items():
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)
        times = {}
        for mode in ("1", "0"):
            os.environ["IEF_FLASH_BWD_T"] = mode
            jax.clear_caches()
            times[mode] = time_fwdbwd(q, k, v)
        speedup = times["0"] / times["1"]
        results[name] = {
            "t_layout_ms": times["1"] * 1e3,
            "classic_ms": times["0"] * 1e3,
            "speedup": speedup,
        }
        print(
            f"{name}: fwd+bwd T {times['1']*1e3:.3f} ms  classic"
            f" {times['0']*1e3:.3f} ms  speedup {speedup:.3f}x",
            flush=True,
        )
    os.environ.pop("IEF_FLASH_BWD_T", None)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
