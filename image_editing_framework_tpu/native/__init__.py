"""Native runtime components (C++, loaded via ctypes).

``MmapSafetensors`` reads checkpoint files through the C++ mmap reader
(safetensors_mmap.cpp): the JSON header is parsed host-side, tensors are
zero-copy numpy views onto the mapped region — no heap copy between disk
cache and ``jax.device_put`` for multi-GB SD weights. The library is built
on demand with the in-tree Makefile; loader.py falls back to the safetensors
package when no compiler is available.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import Dict, Iterator, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsafetensors_mmap.so")

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": None,  # no numpy bfloat16: viewed as uint16, converted on use
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


def _build() -> None:
    subprocess.run(
        ["make", "-C", _DIR, "-s"], check=True, capture_output=True
    )


_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.sts_open.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_void_p)]
    lib.sts_open.restype = ctypes.c_int
    lib.sts_header.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.sts_header.restype = ctypes.c_int
    lib.sts_data.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.sts_data.restype = ctypes.c_int
    lib.sts_close.argtypes = [ctypes.c_void_p]
    lib.sts_close.restype = ctypes.c_int
    _lib = lib
    return lib


def bf16_to_f32(raw_u16: np.ndarray) -> np.ndarray:
    """Widen a uint16-viewed bfloat16 array to float32 (bit shift)."""
    out = raw_u16.astype(np.uint32) << 16
    return out.view(np.float32)


class _OwnedView(np.ndarray):
    """ndarray view that keeps its MmapSafetensors reader alive: the mapped
    region must not be munmap'ed (reader __del__) while any tensor view —
    or a CPU-backend jax.Array aliasing it — still points into it."""

    _owner = None


class MmapSafetensors:
    """Zero-copy safetensors file. Tensor access returns views into the
    mapped file (read-only) that keep the mapping alive for their own
    lifetime; bf16 tensors are converted to float32 on read (a real copy)."""

    def __init__(self, path: str):
        lib = _load_lib()
        handle = ctypes.c_void_p()
        rc = lib.sts_open(path.encode(), ctypes.byref(handle))
        if rc != 0:
            raise OSError(f"sts_open({path}) failed with {rc}")
        self._lib = lib
        self._handle = handle

        hdr_ptr = ctypes.c_char_p()
        hdr_len = ctypes.c_uint64()
        lib.sts_header(handle, ctypes.byref(hdr_ptr), ctypes.byref(hdr_len))
        header = ctypes.string_at(hdr_ptr, hdr_len.value).decode("utf-8")
        meta = json.loads(header)
        meta.pop("__metadata__", None)
        self.meta: Dict[str, dict] = meta

        data_ptr = ctypes.POINTER(ctypes.c_uint8)()
        data_len = ctypes.c_uint64()
        lib.sts_data(handle, ctypes.byref(data_ptr), ctypes.byref(data_len))
        self._buf = np.ctypeslib.as_array(data_ptr, shape=(data_len.value,))

    def keys(self):
        return self.meta.keys()

    def __contains__(self, key: str) -> bool:
        return key in self.meta

    def __getitem__(self, key: str) -> np.ndarray:
        info = self.meta[key]
        start, end = info["data_offsets"]
        raw = self._buf[start:end]
        shape = tuple(info["shape"])
        dt = info["dtype"]
        if dt == "BF16":
            return bf16_to_f32(raw.view(np.uint16)).reshape(shape)  # a copy
        np_dt = _DTYPES[dt]
        if np_dt is None:
            raise ValueError(f"unsupported dtype {dt}")
        view = raw.view(np_dt).reshape(shape).view(_OwnedView)
        view._owner = self
        return view

    def items(self) -> Iterator[Tuple[str, np.ndarray]]:
        for k in self.meta:
            yield k, self[k]

    def close(self) -> None:
        """Explicitly unmap the file. Only safe when no tensor view returned
        by __getitem__ — nor any jax.Array that zero-copy-aliased one on the
        CPU backend — can still be read. Deliberately NOT called from a
        __del__: the CPU backend may alias the mapped pages without holding a
        Python reference, so unmapping on garbage collection is a
        use-after-free (wandering segfaults under real load). An unclosed
        read-only file-backed mapping costs address space only; the pages are
        reclaimable and the process exit releases everything."""
        if self._handle:
            self._lib.sts_close(self._handle)
            self._handle = None


def available() -> bool:
    if os.environ.get("IEF_DISABLE_NATIVE"):
        return False
    try:
        _load_lib()
        return True
    except Exception:
        return False
