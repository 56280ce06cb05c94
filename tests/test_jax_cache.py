"""Persistent-compilation-cache keying (VERDICT r3 item 4).

XLA AOT artifacts are CPU-feature-specific; a literal shared /tmp path can
reload artifacts compiled on a host with different features — a latent SIGILL
observed as a warning in MULTICHIP_r03.json. The cache dir must be keyed by a
host fingerprint so a feature-mismatched host gets a cold cache, not a crash.
"""

import platform

from image_editing_framework_tpu.utils.jax_cache import (
    compilation_cache_dir,
    host_fingerprint,
)


def test_fingerprint_is_deterministic_and_machine_keyed():
    fp = host_fingerprint()
    assert fp == host_fingerprint()
    assert fp.startswith(platform.machine())


def test_cache_dir_is_keyed_not_shared():
    d = compilation_cache_dir()
    assert d != "/tmp/ief_jax_cache"  # the literal shared path is the hazard
    assert d.startswith("/tmp/ief_jax_cache_")
    assert compilation_cache_dir(base="/x/y") == "/x/y_" + host_fingerprint()


def test_fingerprint_hashes_cpu_feature_flags(monkeypatch):
    """Two hosts with different /proc/cpuinfo feature flags must land in
    different cache directories even on the same architecture."""
    import builtins
    import io

    real_open = builtins.open

    def fake_cpuinfo(flags):
        def _open(path, *a, **kw):
            if path == "/proc/cpuinfo":
                return io.StringIO(f"flags\t: {flags}\n")
            return real_open(path, *a, **kw)

        return _open

    monkeypatch.setattr(builtins, "open", fake_cpuinfo("fpu avx2 avx512f"))
    fp_a = host_fingerprint()
    monkeypatch.setattr(builtins, "open", fake_cpuinfo("fpu neon"))
    fp_b = host_fingerprint()
    assert fp_a != fp_b
    assert fp_a.startswith(platform.machine())
