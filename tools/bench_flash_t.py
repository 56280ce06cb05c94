"""Kernel-level A/B of the transposed-layout flash forward (IEF_FLASH_T)
at the production hot shapes, on the real chip.

Timing: N chained kernel invocations inside ONE jitted scan (each iteration's
Q is perturbed by the previous iteration's output scalar, so the chain cannot
be reordered or elided), one host sync at the end — immune to the tunnel's
async-dispatch artifact (see tools/bench_attn_layouts.py).

Run: python tools/bench_flash_t.py
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

    @jax.jit
    def run(q, k, v):
        def body(acc, _):
            qi = q * (1.0 + 1e-12 * acc).astype(q.dtype)
            out = flash_attention(qi, k, v)
            return out[0, 0, 0, 0].astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return acc

    return run


def time_flash(q, k, v, lo=20, hi=120):
    """Per-call seconds via the slope between two chain lengths. Through the
    axon tunnel `block_until_ready` returns without any device round-trip
    (measured: a 30-kernel chain 'completes' in 0.1 ms), so the only honest
    sync is fetching the result scalar to the host; the slope between two
    chain lengths then cancels the fetch RTT."""
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
        # SD1.5 64^2 self-attn sites, CFG batch 4: (B, H, N, D)
        "sd15_res64": (4, 8, 4096, 40),
        # SDXL res-32 10-layer stacks, CFG batch 4
        "xl_res32": (4, 10, 1024, 64),
        # SD1.5 32^2 sites
        "sd15_res32": (4, 8, 1024, 80),
    }
    results = {}
    for name, (b, h, n, d) in shapes.items():
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)
        times = {}
        for mode in ("1", "0"):
            os.environ["IEF_FLASH_T"] = mode
            # separate process-level caches are not needed: the env flag is
            # read at trace time and jit cache keys ignore it, so clear.
            jax.clear_caches()
            times[mode] = time_flash(q, k, v)
        speedup = times["0"] / times["1"]
        results[name] = {
            "t_layout_ms": times["1"] * 1e3,
            "classic_ms": times["0"] * 1e3,
            "speedup": speedup,
        }
        print(
            f"{name}: T {times['1']*1e3:.3f} ms  classic {times['0']*1e3:.3f} ms"
            f"  speedup {speedup:.3f}x",
            flush=True,
        )
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
