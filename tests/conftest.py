"""Test harness config.

Must run before jax initializes its backend: force the CPU platform with 8
virtual devices so multi-chip sharding tests run without TPU hardware.
"""

import os
import sys

# Force CPU (the ambient environment may pin JAX_PLATFORMS to a TPU platform,
# and the TPU plugin ignores the env var — use jax.config instead).
# Set IEF_TEST_TPU=1 to run the suite on real TPU hardware instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("IEF_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    # The ambient sitecustomize hooks jax's backend lookup; while the TPU
    # tunnel is down (or libtpu-mismatched) that hook can block or break
    # EVERY jax call — even CPU-pinned ones. The CPU suite never needs the
    # tunneled backend: drop its factory unconditionally (no probe, no
    # 45-90s subprocess timeout at pytest start when the tunnel is dead).
    from __graft_entry__ import _pin_cpu_platform

    _pin_cpu_platform()
    # The suite is XLA-compile-dominated (tiny models, hundreds of unique
    # programs, often a single host core): trading optimized codegen for
    # compile speed roughly halves suite wall-clock with no measurable
    # runtime cost at test shapes. IEF_TEST_OPT=1 restores full optimization.
    if not os.environ.get("IEF_TEST_OPT"):
        jax.config.update("jax_disable_most_optimizations", True)
else:
    # On the real chip, f32 matmuls default to single-pass bf16 — the
    # suite's tight-tolerance semantics tests (written against the exact CPU
    # path) need true f32. Production pipelines run bf16 and are unaffected.
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

