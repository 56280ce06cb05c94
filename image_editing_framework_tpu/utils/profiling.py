"""Tracing / profiling utilities (SURVEY.md §5: the reference has only tqdm
bars; here each phase is annotated for the XLA profiler and a wall-clock
harness is provided for the benchmark CLI)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator

import jax
import numpy as np


@contextlib.contextmanager
def phase(name: str) -> Iterator[None]:
    """Annotate a phase (invert / nti / denoise / decode) in profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a full profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock phase timer that forces device execution.

    block_until_ready is not reliable on the tunneled TPU platform, so
    completion is forced by fetching (a small slice of) the result.
    """

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def measure(self, name: str, result_fn=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if result_fn is not None:
            np.asarray(result_fn())
        self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def force(self, x) -> np.ndarray:
        return np.asarray(x)


def enable_nan_debugging() -> None:
    """Debug-flag NaN guard (SURVEY.md §5 race/sanitizer note)."""
    jax.config.update("jax_debug_nans", True)
