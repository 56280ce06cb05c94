"""Benchmark CLI: per-image 50-step real-image edit latency on one TPU chip.

Workload (mirrors the reference's canonical flow, p2p/edit_real.py):
  50-step DDIM inversion (UNet batch 1) + 50-step P2P edit (CFG batch 4 =
  2 prompts x uncond/cond) + VAE decode, SD1.5 architecture at 512x512,
  bfloat16 params/activations, fused Pallas flash self-attention.

Random weights — compute cost is identical to trained weights; the reference
publishes no numbers (BASELINE.md), so the comparison point is the north-star
target: full PIE-Bench (700 images) under 10 min on a v4-8, i.e.
600s * 8 chips / 700 images = 6.857 s per image per chip.
vs_baseline = target_latency / measured  (>1 means beating the target).

Prints ONE JSON line. Set IEF_BENCH=xl for the SDXL 1024^2 workload or
IEF_BENCH=nti for the null-text-inversion flow (both informational; the
default SD1.5 metric is the tracked one).

IEF_BENCH=nti measures the reference's canonical real-image P2P flow with
null-text inversion (p2p/edit_real.py:54-55 + p2p/inversion/nti.py): 50-step
DDIM inversion + NTI (epsilon=0 so every step runs the full 10 inner Adam
iterations — the reference's <=10x50 fwd+bwd cost envelope, BASELINE.md; real
runs early-stop below this) + 50-step edit with per-step optimized uncond +
decode.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: the SD-scale programs take minutes to
# compile cold; repeat driver invocations hit the cache. Keyed by a host CPU
# fingerprint so XLA AOT artifacts never reload on a feature-mismatched host
# (SIGILL hazard — see utils/jax_cache.py).
from image_editing_framework_tpu.utils.jax_cache import compilation_cache_dir

jax.config.update("jax_compilation_cache_dir", compilation_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

TARGET_S_PER_IMAGE_PER_CHIP = 600.0 * 8 / 700.0  # 6.857 s


def _require_live_tunnel() -> None:
    """Fail fast (clear stderr + exit 2) instead of hanging forever when the
    tunneled-TPU backend is registered but its tunnel is down — the ambient
    backend hook otherwise blocks the first device op indefinitely."""
    import subprocess
    import sys

    try:
        from jax._src import xla_bridge as _xb
    except Exception:
        return
    if "axon" not in getattr(_xb, "_backend_factories", {}):
        return
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
            capture_output=True, text=True, timeout=120,
        )
        if probe.returncode == 0 and "ok" in probe.stdout:
            return
        err = probe.stderr.strip().splitlines()[-1:] or ["no output"]
    except subprocess.TimeoutExpired:
        err = ["device probe hung >120s"]
    print(f"bench.py: TPU tunnel unreachable ({err[0]}); "
          "refusing to start a bench that would hang", file=sys.stderr)
    sys.exit(2)


def main() -> None:
    import os

    if os.environ.get("IEF_BENCH_TRACE"):
        # trace mode runs anywhere — drop a dead tunnel's backend (its hook
        # would block even the small eager setup ops) and trace on CPU
        from __graft_entry__ import _neutralize_dead_tunnel

        _neutralize_dead_tunnel()
    else:
        _require_live_tunnel()

    from image_editing_framework_tpu.core.config import P2PConfig
    from image_editing_framework_tpu.core.scheduler import make_ddim_schedule
    from image_editing_framework_tpu.inversion.ddim import _invert_scan
    from image_editing_framework_tpu.inversion.nti import _nti_scan
    from image_editing_framework_tpu.methods.base import _denoise_scan, LocalBlend
    from image_editing_framework_tpu.models import configs
    from image_editing_framework_tpu.models.tokenizer import WordTokenizer
    from image_editing_framework_tpu.models.unet import UNet2DCondition
    from image_editing_framework_tpu.models.vae import AutoencoderKL, VAEConfig
    from image_editing_framework_tpu.ops.controls import build_p2p_control

    dtype = jnp.bfloat16
    use_flash = jax.default_backend() == "tpu"
    sched = make_ddim_schedule(50)

    mode = os.environ.get("IEF_BENCH", "")
    is_xl = mode == "xl"
    is_nti = mode == "nti"
    if is_xl:
        unet_cfg, side, ctx_dim, metric = (
            configs.SDXL_UNET, 128, 2048, "p2p_real_edit_latency_sdxl_1024"
        )
    elif is_nti:
        unet_cfg, side, ctx_dim, metric = (
            configs.SD15_UNET, 64, 768, "p2p_nti_edit_latency_sd15_512"
        )
    else:
        unet_cfg, side, ctx_dim, metric = (
            configs.SD15_UNET, 64, 768, "p2p_real_edit_latency_sd15_512"
        )

    unet = UNet2DCondition(unet_cfg, dtype=dtype)
    lat1 = jnp.zeros((1, side, side, 4), dtype)
    ctx1 = jnp.zeros((1, 77, ctx_dim), dtype)
    added1 = added4 = None
    if is_xl:
        tids = jnp.asarray([[side * 8, side * 8, 0, 0, side * 8, side * 8]], dtype)
        added1 = {"text_embeds": jnp.zeros((1, 1280), dtype), "time_ids": tids}
        added4 = {
            "text_embeds": jnp.zeros((4, 1280), dtype),
            "time_ids": jnp.broadcast_to(tids, (4, 6)),
        }
    from image_editing_framework_tpu.models.init_utils import fast_random_params

    # Params are STORED bf16 (matching registry.load_pipeline's production
    # loading); flax's f32 default would re-fetch 2x the param bytes from HBM
    # every UNet step. IEF_BENCH_PARAM_DTYPE=f32 restores the old storage for
    # A/B comparison.
    p_dtype = (
        jnp.float32
        if os.environ.get("IEF_BENCH_PARAM_DTYPE") == "f32"
        else dtype
    )
    trace_only = bool(os.environ.get("IEF_BENCH_TRACE"))
    vae = AutoencoderKL(VAEConfig(), dtype=dtype)
    if trace_only:
        # abstract params: shapes/dtypes only — materializing SD/XL-scale
        # weights takes minutes on a lone CPU core and the trace never
        # reads values
        params = jax.eval_shape(
            lambda: fast_random_params(
                unet, lat1, 0, ctx1, None, added1, param_dtype=p_dtype
            )
        )
        vae_params = jax.eval_shape(
            lambda: fast_random_params(
                vae, jnp.zeros((1, side * 8, side * 8, 3), dtype), seed=1,
                param_dtype=p_dtype,
            )
        )
    else:
        params = fast_random_params(
            unet, lat1, 0, ctx1, None, added1, param_dtype=p_dtype
        )
        vae_params = fast_random_params(
            vae, jnp.zeros((1, side * 8, side * 8, 3), dtype), seed=1,
            param_dtype=p_dtype,
        )
    decode = jax.jit(lambda p, z: vae.apply(p, z, method=AutoencoderKL.decode))

    ctrl = build_p2p_control(
        ["a cat sitting on a chair", "a dog sitting on a chair"],
        WordTokenizer(),
        50,
        P2PConfig(edit_type="replace"),
    )
    latent = jax.random.normal(jax.random.PRNGKey(2), (1, side, side, 4), dtype)
    cond = jax.random.normal(jax.random.PRNGKey(3), (1, 77, ctx_dim), dtype)
    context = jax.random.normal(jax.random.PRNGKey(4), (4, 77, ctx_dim), dtype)
    uncond0 = jax.random.normal(jax.random.PRNGKey(5), (1, 77, ctx_dim), dtype)

    def run_once(params=params, vae_params=vae_params):
        last, traj = _invert_scan(unet, params, sched, latent, cond, added1, use_flash)
        uncond_seq = None
        if is_nti:
            # epsilon=0: never early-stop, measuring the reference's full
            # <=10 inner Adam iterations x 50 steps cost envelope.
            uncond_seq = _nti_scan(
                unet, params, sched, traj,
                cond.astype(jnp.float32), uncond0.astype(jnp.float32),
                jnp.asarray(7.5, jnp.float32), jnp.asarray(1e-2, jnp.float32),
                jnp.asarray(100.0, jnp.float32), jnp.asarray(0.0, jnp.float32),
                added1, None, 10, False, use_flash,
            )
        lat2 = jnp.broadcast_to(last, (2, side, side, 4))
        final, _, _ = _denoise_scan(
            unet, params, sched, lat2, context, ctrl,
            jnp.asarray(7.5, dtype), added4, uncond_seq,
            LocalBlend(jnp.zeros((1, 77))), None,
            use_flash, False, False, False, None,
        )
        if is_xl:
            # 1024^2 decode transients + 5.1GB of params: decode per image
            return jnp.concatenate(
                [decode(vae_params, final[i : i + 1]) for i in range(2)]
            )
        return decode(vae_params, final)

    import numpy as np

    if os.environ.get("IEF_BENCH_TRACE"):
        # Trace-only smoke (no compile, no device): abstractly evaluates the
        # whole measured program chain, which catches call-signature rot in
        # the internal-API calls above (e.g. _denoise_scan arity) in seconds
        # on any backend. Exercised by tests/test_bench_trace.py.
        out = jax.eval_shape(run_once, params, vae_params)
        print(json.dumps({"metric": metric, "trace_ok": True,
                          "out_shape": list(out.shape)}))
        return

    # warmup / compile. NOTE: block_until_ready does not reliably force
    # execution on the tunneled TPU platform — fetch to host instead (a real
    # edit fetches the image to save it anyway).
    np.asarray(run_once())

    phase_desc = (
        "50-step inversion + NTI 10x50 Adam envelope + 50-step edit + decode"
        if is_nti
        else "50-step inversion + 50-step edit + decode"
    )
    # the NTI envelope run is ~10x longer per image, but best-of-1 would keep
    # the host-fetch stall noise the min exists to exclude — use 2
    n = 2 if is_nti else 3
    # Best-of-n: the tunnel's host fetch occasionally stalls for tens of ms,
    # which contaminates a mean with non-compute noise (observed +-0.1 s
    # run-to-run on a 2.7 s workload); the minimum is the stable
    # device-latency estimate.
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        img = np.asarray(run_once())
        times.append(time.perf_counter() - t0)
    per_image = min(times)

    if os.environ.get("IEF_BENCH_PHASES"):
        # per-phase timings to stderr (stdout stays ONE JSON line)
        import sys

        def timed(fn):
            np.asarray(jax.tree_util.tree_leaves(fn())[0])
            t = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(fn())[0])
            return time.perf_counter() - t

        t_inv = timed(
            lambda: _invert_scan(unet, params, sched, latent, cond, added1, use_flash)[0]
        )
        lat2 = jnp.broadcast_to(latent, (2, side, side, 4))
        t_edit = timed(
            lambda: _denoise_scan(
                unet, params, sched, lat2, context, ctrl, jnp.asarray(7.5, dtype),
                added4, None, LocalBlend(jnp.zeros((1, 77))), None, use_flash,
                False, False, False, None,
            )[0]
        )
        print(
            f"phases: invert={t_inv:.3f}s edit={t_edit:.3f}s "
            f"decode≈{per_image - t_inv - t_edit:.3f}s",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(per_image, 4),
                "unit": f"s/image ({phase_desc}, 1 chip)",
                "vs_baseline": round(TARGET_S_PER_IMAGE_PER_CHIP / per_image, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
