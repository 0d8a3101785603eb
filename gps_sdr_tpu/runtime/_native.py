"""ctypes bindings for the native host-ingest library (csrc/ingest.cpp).

Build with `make -C csrc` (produces runtime/libgstingest.so); every
entry point has a numpy fallback in runtime/sources.py and
runtime/buffer.py, so the framework runs without the native build.
Binding is via ctypes because pybind11 is not part of the image.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libgstingest.so")


def _load() -> ctypes.CDLL:
    """Load the library, building it on first use (a fresh checkout has
    no .so — it's a build artifact).  Raise ImportError rather than
    OSError so `pytest.importorskip` and the numpy-fallback gates in
    sources.py/buffer.py behave."""
    try:
        return ctypes.CDLL(_LIB_PATH)
    except OSError:
        pass
    import subprocess
    csrc = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
    try:
        subprocess.run(["make", "-C", csrc], check=True,
                       capture_output=True, timeout=120)
        return ctypes.CDLL(_LIB_PATH)
    except Exception as e:
        raise ImportError(
            f"native ingest library unavailable (build: {e}); "
            f"run `make -C csrc`") from e


_lib = _load()

_lib.gst_unpack_iq.argtypes = [
    ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_float),
    ctypes.c_int64]
_lib.gst_pack_iq.argtypes = [
    ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint16),
    ctypes.c_int64]
_lib.gst_unpack_iq_file.argtypes = [
    ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
    ctypes.POINTER(ctypes.c_float)]
_lib.gst_unpack_iq_file.restype = ctypes.c_int64
_lib.gst_ring_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
_lib.gst_ring_create.restype = ctypes.c_void_p
_lib.gst_ring_destroy.argtypes = [ctypes.c_void_p]
_lib.gst_ring_push.argtypes = [ctypes.c_void_p,
                               ctypes.POINTER(ctypes.c_float)]
_lib.gst_ring_pop.argtypes = [ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_float)]
_lib.gst_ring_pop.restype = ctypes.c_int64
_lib.gst_ring_size.argtypes = [ctypes.c_void_p]
_lib.gst_ring_size.restype = ctypes.c_int64


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u16ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))


def unpack_iq(words: np.ndarray) -> np.ndarray:
    """uint16 packed IQ -> normalized complex64 (native path)."""
    words = np.ascontiguousarray(words, dtype=np.uint16)
    out = np.empty(words.size * 2, dtype=np.float32)
    _lib.gst_unpack_iq(_u16ptr(words), _fptr(out), words.size)
    return out.view(np.complex64).reshape(words.shape)


def pack_iq(samples: np.ndarray) -> np.ndarray:
    """complex64 -> packed uint16 words (native path)."""
    flat = np.ascontiguousarray(samples, dtype=np.complex64)
    pairs = flat.view(np.float32)
    out = np.empty(flat.size, dtype=np.uint16)
    _lib.gst_pack_iq(_fptr(pairs), _u16ptr(out), flat.size)
    return out.reshape(samples.shape)


def unpack_iq_file(path: str, offset_samples: int,
                   n_samples: int) -> np.ndarray | None:
    """Read + unpack one block straight from a capture file; None at
    EOF/short read."""
    out = np.empty(n_samples * 2, dtype=np.float32)
    got = _lib.gst_unpack_iq_file(path.encode(), offset_samples,
                                  n_samples, _fptr(out))
    if got != n_samples:
        return None
    return out.view(np.complex64)


class NativeRing:
    """Lock-free SPSC block ring with drop-oldest + skip accounting
    (the reference's bounded deque, gpsrecv.py:76-104, off the GIL)."""

    def __init__(self, capacity: int, block_samples: int):
        self.block_samples = block_samples
        self._h = _lib.gst_ring_create(capacity, 2 * block_samples)
        if not self._h:
            raise MemoryError("ring allocation failed")

    def push(self, block: np.ndarray) -> None:
        flat = np.ascontiguousarray(block, dtype=np.complex64)
        _lib.gst_ring_push(self._h, _fptr(flat.view(np.float32)))

    def pop(self) -> tuple[np.ndarray, int] | None:
        """(block, skipped_blocks) or None if empty."""
        out = np.empty(self.block_samples * 2, dtype=np.float32)
        skipped = _lib.gst_ring_pop(self._h, _fptr(out))
        if skipped < 0:
            return None
        return out.view(np.complex64), int(skipped)

    def __len__(self) -> int:
        return int(_lib.gst_ring_size(self._h))

    def close(self) -> None:
        if self._h:
            _lib.gst_ring_destroy(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
