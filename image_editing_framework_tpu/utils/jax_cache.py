"""Persistent-compilation-cache location, keyed by host fingerprint.

XLA's AOT artifacts (notably XLA:CPU's) are compiled for the build host's CPU
feature set; reloading them on a host with different features is a latent
SIGILL ("Machine type used for XLA:CPU compilation doesn't match..." —
observed in the driver's multichip dryrun, MULTICHIP_r03.json). A shared
literal path like /tmp/ief_jax_cache survives across heterogeneous hosts via
shared tmp or image snapshots, so the cache directory is instead keyed by
machine architecture + a hash of the CPU feature flags: a host with different
features gets a different (cold) cache instead of a crash.

Stdlib-only: imported before jax backend init by ``__graft_entry__``/``bench``.
"""

from __future__ import annotations

import hashlib
import platform


def host_fingerprint() -> str:
    """Architecture + short hash of the CPU feature flags of THIS host."""
    tag = platform.machine() or "unknown"
    try:
        with open("/proc/cpuinfo") as f:
            flags = next(
                (line for line in f if line.startswith(("flags", "Features"))),
                "",
            )
        if flags:
            tag += "-" + hashlib.sha1(flags.encode()).hexdigest()[:10]
    except OSError:
        pass
    return tag


def compilation_cache_dir(base: str = "/tmp/ief_jax_cache") -> str:
    return f"{base}_{host_fingerprint()}"
