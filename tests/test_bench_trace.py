"""bench.py call-signature smoke: trace the measured program chains.

The driver runs ``python bench.py`` on real hardware at round end; an
internal-API change (e.g. ``_denoise_scan`` arity) that only bench.py missed
would otherwise surface there first. IEF_BENCH_TRACE abstractly evaluates the
whole chain (no compile, no weights) in seconds per mode.
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("mode,shape", [("", [2, 512, 512, 3]),
                                        ("nti", [2, 512, 512, 3])])
def test_bench_traces(mode, shape):
    env = dict(os.environ, IEF_BENCH=mode, IEF_BENCH_TRACE="1",
               JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["trace_ok"] and rep["out_shape"] == shape


@pytest.mark.slow
def test_bench_traces_xl():
    env = dict(os.environ, IEF_BENCH="xl", IEF_BENCH_TRACE="1",
               JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["trace_ok"] and rep["out_shape"] == [2, 1024, 1024, 3]
