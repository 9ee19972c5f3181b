"""ctypes bindings for the native mmap safetensors loader (csrc/).

Zero-copy: tensors are numpy views directly onto the mmapped file; bf16 is
exposed via ``ml_dtypes.bfloat16`` (numpy has no native bf16).  The shared
library is built on first use with g++ (cached next to the source).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_SO = _CSRC / "libstl.so"
_lock = threading.Lock()
_lib = None

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


def _np_dtype(name: str):
    if name == "BF16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(_DTYPES[name])


def _build() -> Path:
    src = _CSRC / "safetensors_loader.cpp"
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-o", str(_SO), str(src)],
        check=True,
        capture_output=True,
    )
    return _SO


def _get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _SO.exists() or _SO.stat().st_mtime < (_CSRC / "safetensors_loader.cpp").stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_SO))
        lib.stl_open.restype = ctypes.c_void_p
        lib.stl_open.argtypes = [ctypes.c_char_p]
        lib.stl_tensor_count.restype = ctypes.c_int64
        lib.stl_tensor_count.argtypes = [ctypes.c_void_p]
        lib.stl_tensor_name.restype = ctypes.c_char_p
        lib.stl_tensor_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.stl_tensor_info.restype = ctypes.c_int
        lib.stl_tensor_info.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.stl_data.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.stl_data.argtypes = [ctypes.c_void_p]
        lib.stl_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


class NativeSafetensors:
    """One mmapped .safetensors file; tensors as zero-copy numpy views."""

    def __init__(self, path: str | Path):
        self._lib = _get_lib()
        self._handle = self._lib.stl_open(str(path).encode())
        if not self._handle:
            raise OSError(f"failed to open safetensors file {path}")
        self.path = Path(path)

    def keys(self) -> List[str]:
        n = self._lib.stl_tensor_count(self._handle)
        return [self._lib.stl_tensor_name(self._handle, i).decode() for i in range(n)]

    def info(self, name: str) -> Tuple[str, Tuple[int, ...], int, int]:
        dtype_buf = ctypes.create_string_buffer(16)
        ndim = ctypes.c_int64()
        shape = (ctypes.c_int64 * 8)()
        offset = ctypes.c_uint64()
        nbytes = ctypes.c_uint64()
        rc = self._lib.stl_tensor_info(
            self._handle, name.encode(), dtype_buf, ctypes.byref(ndim), shape,
            ctypes.byref(offset), ctypes.byref(nbytes),
        )
        if rc != 0:
            raise KeyError(name)
        return (
            dtype_buf.value.decode(),
            tuple(shape[i] for i in range(ndim.value)),
            offset.value,
            nbytes.value,
        )

    def get(self, name: str) -> np.ndarray:
        """Zero-copy view into the mmap.  The view's base buffer holds a
        reference to this object, so GC alone never unmaps under a live
        array; an EXPLICIT ``close()`` / ``with``-exit does unmap and
        invalidates all views — copy (``np.array(...)``) anything that must
        outlive the handle."""
        dtype_name, shape, offset, nbytes = self.info(name)
        dt = _np_dtype(dtype_name)
        base = self._lib.stl_data(self._handle)
        buf = (ctypes.c_uint8 * nbytes).from_address(
            ctypes.addressof(base.contents) + offset
        )
        buf._owner = self  # keep the mapping alive while any view exists
        arr = np.frombuffer(buf, dtype=dt).reshape(shape)
        arr.flags.writeable = False
        return arr

    def close(self):
        """Unmap the file.  Views returned by :meth:`get` become invalid."""
        if self._handle:
            self._lib.stl_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def load_file(path: str | Path) -> Dict[str, np.ndarray]:
    """All tensors of a file as zero-copy numpy views (file stays mapped for
    the process lifetime — intended for load-then-device_put flows)."""
    f = NativeSafetensors(path)
    return {k: f.get(k) for k in f.keys()}
