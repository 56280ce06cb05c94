"""On-chip microbenchmark: where does the SD UNet step spend its time?

The ambient TPU is reached through a tunnel with tens-of-ms per-dispatch
latency, so every timing here wraps the target computation in a
``lax.scan`` of ITERS applications inside ONE jitted program (exactly how
the production denoise/invert loops run) and divides by ITERS.

Also prints XLA's own cost analysis (FLOPs, bytes accessed) per program so
measured times can be placed against the v5e rooflines (197 bf16-TFLOP/s,
~819 GB/s HBM).

Usage:  python tools/profile_unet.py [xl]
Informational tool — not part of the bench metric.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image_editing_framework_tpu.utils.jax_cache import compilation_cache_dir
jax.config.update("jax_compilation_cache_dir", compilation_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from image_editing_framework_tpu.models import configs
from image_editing_framework_tpu.models.init_utils import fast_random_params
from image_editing_framework_tpu.models.unet import (
    ResnetBlock,
    Transformer2D,
    UNet2DCondition,
)
from image_editing_framework_tpu.models.vae import AutoencoderKL, VAEConfig
from image_editing_framework_tpu.ops.controls import NoneStep

ITERS = int(os.environ.get("IEF_PROFILE_ITERS", "100"))
PEAK_TF = 197.0  # v5e bf16
PEAK_GBS = 819.0  # v5e HBM

# The tunnel to the ambient chip pays a fixed RTT per program invocation
# (~tens of ms): measure it with an empty-ish program once and subtract it
# from every scan timing, else it reads as +RTT/ITERS ms on every component.
_RTT = None


def measured_rtt() -> float:
    global _RTT
    if _RTT is None:
        f = jax.jit(lambda x: x * 2.0)
        y = np.asarray(f(jnp.float32(1)))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(jnp.float32(1)))
            ts.append(time.perf_counter() - t0)
        _RTT = min(ts)
    return _RTT


def scan_time(fn, params, x, *rest):
    """Time ITERS sequential applications of fn inside one jitted scan.

    The program returns a SCALAR reduction of the final carry: fetching the
    full activation would be timed through the tunnel (~tens of MB/s), which
    swamps the on-chip time by orders of magnitude. The scalar still forces
    the whole chain (each iteration feeds the next).
    """

    @jax.jit
    def run(params, x):
        def step(carry, _):
            out = fn(params, carry, *rest)
            # keep carry shape: fold output back (shapes match for our cases)
            return out, None

        y, _ = jax.lax.scan(step, x, None, length=ITERS)
        return y.astype(jnp.float32).mean()

    lowered = run.lower(params, x)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    # XLA's cost analysis counts a scan body ONCE (it does not multiply by
    # the trip count), so these are already per-iteration numbers — matching
    # the per-iteration dt below.
    flops = cost.get("flops", 0.0)
    bytes_ = cost.get("bytes accessed", 0.0)
    np.asarray(run(params, x))  # warm
    t0 = time.perf_counter()
    np.asarray(run(params, x))
    dt = (time.perf_counter() - t0 - measured_rtt()) / ITERS
    return dt, flops, bytes_


def report(name, dt, flops, bytes_):
    tf = flops / dt / 1e12
    gbs = bytes_ / dt / 1e9
    mxu_floor = flops / PEAK_TF / 1e12
    hbm_floor = bytes_ / PEAK_GBS / 1e9
    floor = max(mxu_floor, hbm_floor)
    bound = "MXU" if mxu_floor > hbm_floor else "HBM"
    print(
        f"  {name:34s} {dt*1e3:8.2f} ms  {tf:6.1f} TF/s  {gbs:6.0f} GB/s"
        f"  floor={floor*1e3:6.2f} ms ({bound})  gap={dt/floor:4.2f}x"
    )


def main() -> None:
    is_xl = len(sys.argv) > 1 and sys.argv[1] == "xl"
    dtype = jnp.bfloat16
    use_flash = jax.default_backend() == "tpu"
    cfg = configs.SDXL_UNET if is_xl else configs.SD15_UNET
    side = 128 if is_xl else 64
    ctx_dim = cfg.cross_attention_dim

    unet = UNet2DCondition(cfg, dtype=dtype)
    added1 = None
    tids = None
    if is_xl:
        tids = jnp.asarray([[side * 8, side * 8, 0, 0, side * 8, side * 8]], dtype)
        added1 = {"text_embeds": jnp.zeros((1, 1280), dtype), "time_ids": tids}

    lat1 = jnp.zeros((1, side, side, 4), dtype)
    ctx1 = jnp.zeros((1, 77, ctx_dim), dtype)
    params = fast_random_params(unet, lat1, 0, ctx1, None, added1)

    print(
        f"model={'sdxl' if is_xl else 'sd15'} side={side} "
        f"backend={jax.default_backend()} iters={ITERS}"
    )
    print("\nfull UNet forward (scan-wrapped):")
    for b in (1, 4):
        x = jax.random.normal(jax.random.PRNGKey(0), (b, side, side, 4), dtype)
        c = jax.random.normal(jax.random.PRNGKey(1), (b, 77, ctx_dim), dtype)
        a = None
        if is_xl:
            a = {
                "text_embeds": jnp.zeros((b, 1280), dtype),
                "time_ids": jnp.broadcast_to(tids, (b, 6)),
            }

        def fwd(p, lat, ctx=c, add=a):
            return unet.apply(p, lat, 500, ctx, None, add, use_flash)[0]

        dt, fl, by = scan_time(fwd, params, x)
        report(f"unet fwd b={b}", dt, fl, by)

    print("\ncomponents (batch 4, scan-wrapped):")
    temb = jnp.zeros((4, cfg.block_out_channels[0] * 4), dtype)
    levels = list(zip(cfg.block_out_channels, [side // (2**i) for i in range(4)]))
    for ch, res in levels:
        rb = ResnetBlock(ch, key="x", dtype=dtype)
        x = jax.random.normal(jax.random.PRNGKey(2), (4, res, res, ch), dtype)
        p = rb.init(jax.random.PRNGKey(0), x, temb, NoneStep())
        dt, fl, by = scan_time(
            lambda p, x: rb.apply(p, x, temb, NoneStep()), p, x
        )
        report(f"resnet ch={ch} res={res}", dt, fl, by)

    for i, (ch, res) in enumerate(levels):
        if cfg.down_block_types[i] != "CrossAttnDownBlock2D":
            continue
        nl = cfg.transformer_layers[i]
        tr = Transformer2D(
            ch, cfg.num_heads[i], ctx_dim, tuple(range(nl)), "down",
            use_linear_projection=cfg.use_linear_projection, dtype=dtype,
        )
        x = jax.random.normal(jax.random.PRNGKey(3), (4, res, res, ch), dtype)
        c = jax.random.normal(jax.random.PRNGKey(4), (4, 77, ctx_dim), dtype)
        p = tr.init(jax.random.PRNGKey(0), x, c, NoneStep(), use_flash)
        dt, fl, by = scan_time(
            lambda p, x: tr.apply(p, x, c, NoneStep(), use_flash)[0], p, x
        )
        report(f"xformer ch={ch} res={res} layers={nl}", dt, fl, by)

    # --- VAE decode (2 images, as in the CFG edit's final decode)
    del params  # free the UNet weights: XL @ 1024^2 decode OOMs otherwise
    vae = AutoencoderKL(VAEConfig(), dtype=dtype)
    vp = fast_random_params(vae, jnp.zeros((1, side * 8, side * 8, 3), dtype), seed=1)
    z = jax.random.normal(jax.random.PRNGKey(5), (2, side, side, 4), dtype)

    @jax.jit
    def dec2(p, z):
        def step(carry, _):
            # the input must depend on the carry or XLA hoists the
            # loop-invariant decode out of the scan (underreporting dt/5)
            img = vae.apply(
                p, z + (carry * 0).astype(z.dtype), method=AutoencoderKL.decode
            )
            return carry + img.astype(jnp.float32).mean(), None

        s, _ = jax.lax.scan(step, jnp.float32(0), None, length=5)
        return s

    comp = dec2.lower(vp, z).compile()
    cost = comp.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    np.asarray(dec2(vp, z))
    t0 = time.perf_counter()
    np.asarray(dec2(vp, z))
    dt = (time.perf_counter() - t0 - measured_rtt()) / 5
    report(
        f"vae decode b=2 {side}x{side}", dt,
        cost.get("flops", 0.0), cost.get("bytes accessed", 0.0),
    )


if __name__ == "__main__":
    main()
