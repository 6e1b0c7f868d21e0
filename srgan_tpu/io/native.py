"""ctypes bindings for the native host-IO runtime (native/srgan_io.cc).

The reference shipped its input pipeline as torch DataLoader worker
processes (SURVEY.md §3.1); this framework's equivalent is an in-process
C++ runtime: memory-mapped ``.npy`` datasets and a threaded crop-gather
prefetcher with a bounded ring queue. It is the HOST-side input path for
databases too large for device HBM; HBM-resident data uses the Pallas
kernel path (srgan_tpu/ops/patches.py) instead.

The shared library builds on demand with g++ (no pybind11 in this image;
plain C ABI + ctypes keeps the binding dependency-free).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsrgan_io.so")
_SOURCE_PATH = os.path.join(_NATIVE_DIR, "srgan_io.cc")

_lib = None
_lib_lock = threading.Lock()


def _build_library() -> None:
    subprocess.run(
        ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-pthread",
         "-shared", "-o", _LIB_PATH, _SOURCE_PATH],
        check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH)
                < os.path.getmtime(_SOURCE_PATH)):
            _build_library()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.sg_open_npy.restype = ctypes.c_void_p
        lib.sg_open_npy.argtypes = [ctypes.c_char_p]
        lib.sg_close.argtypes = [ctypes.c_void_p]
        lib.sg_shape.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_int64)]
        lib.sg_is_float32.restype = ctypes.c_int
        lib.sg_is_float32.argtypes = [ctypes.c_void_p]
        lib.sg_gather_crops.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float)]
        lib.sg_prefetcher_create.restype = ctypes.c_void_p
        lib.sg_prefetcher_create.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_uint64]
        lib.sg_prefetcher_create_u8.restype = ctypes.c_void_p
        lib.sg_prefetcher_create_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_uint64]
        lib.sg_prefetcher_next.restype = ctypes.c_int
        lib.sg_prefetcher_next.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        lib.sg_prefetcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def native_library_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _as_i32_ptr(array: np.ndarray):
    return array.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class NativeDatasetReader:
    """Memory-mapped [N, H, W, C] ``.npy`` dataset with batched crop
    gathers executed in C++."""

    def __init__(self, path: str):
        self._lib = _load()
        self._handle = self._lib.sg_open_npy(
            os.path.abspath(path).encode())
        if not self._handle:
            raise OSError(
                f"cannot open {path}: must be a C-order 4-D .npy of "
                f"float32 or uint8")
        dims = (ctypes.c_int64 * 4)()
        self._lib.sg_shape(self._handle, dims)
        self.shape: Tuple[int, int, int, int] = tuple(int(d) for d in dims)
        self.dtype = (np.float32 if self._lib.sg_is_float32(self._handle)
                      else np.uint8)

    def gather_crops(self, indices: np.ndarray, offsets: np.ndarray,
                     flips: Optional[np.ndarray], patch_size: int,
                     scale: float = 1.0, shift: float = 0.0) -> np.ndarray:
        """[B] indices + [B, 2] (oy, ox) + flips → [B, P, P, C] float32."""
        indices = np.ascontiguousarray(indices, np.int32)
        offsets = np.ascontiguousarray(offsets, np.int32)
        b = len(indices)
        c = self.shape[3]
        out = np.empty((b, patch_size, patch_size, c), np.float32)
        flips_ptr = (_as_i32_ptr(np.ascontiguousarray(flips, np.int32))
                     if flips is not None else None)
        self._lib.sg_gather_crops(
            self._handle, _as_i32_ptr(indices), _as_i32_ptr(offsets),
            flips_ptr, b, patch_size, scale, shift,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    def close(self) -> None:
        if self._handle:
            self._lib.sg_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class NativePrefetcher:
    """Threaded random-crop batch prefetcher over a
    :class:`NativeDatasetReader` (bounded ring queue in C++)."""

    def __init__(self, reader: NativeDatasetReader, batch_size: int,
                 patch_size: int, scale: float = 1.0, shift: float = 0.0,
                 queue_depth: int = 4, num_threads: int = 2,
                 seed: int = 0, output_dtype: str = "float32"):
        self._lib = _load()
        self._reader = reader
        self.batch_size = batch_size
        self.patch_size = patch_size
        self.channels = reader.shape[3]
        if output_dtype not in ("float32", "uint8"):
            raise ValueError(f"unknown output_dtype {output_dtype!r}; "
                             f"choose float32 or uint8")
        self.output_dtype = np.dtype(output_dtype)
        if output_dtype == "uint8":
            # Raw-byte crops (u8 store only, no scale/shift): 4x fewer
            # bytes over the host->device boundary; the caller
            # normalizes in the device graph.
            if reader.dtype != np.uint8:
                raise ValueError("output_dtype='uint8' requires a uint8 "
                                 "dataset")
            if scale != 1.0 or shift != 0.0:
                raise ValueError("scale/shift are float32-output "
                                 "features; uint8 output streams raw "
                                 "bytes (normalize on device)")
            self._handle = self._lib.sg_prefetcher_create_u8(
                reader._handle, batch_size, patch_size, queue_depth,
                num_threads, seed)
        else:
            self._handle = self._lib.sg_prefetcher_create(
                reader._handle, batch_size, patch_size, scale, shift,
                queue_depth, num_threads, seed)
        if not self._handle:
            raise ValueError("prefetcher creation failed (patch larger "
                             "than image, or empty dataset)")

    def next(self) -> Tuple[np.ndarray, np.ndarray]:
        """Blocking: → (batch [B, P, P, C] of ``output_dtype``, source
        indices [B])."""
        batch, idx, _, _ = self.next_with_params()
        return batch, idx

    def next_with_params(self) -> Tuple[np.ndarray, np.ndarray,
                                        np.ndarray, np.ndarray]:
        """Blocking: → (batch, indices [B], offsets [B, 2], flips [B]).

        The sampling parameters let the caller gather matching label crops
        (density maps) with identical augmentation via
        :meth:`NativeDatasetReader.gather_crops`.
        """
        out = np.empty((self.batch_size, self.patch_size, self.patch_size,
                        self.channels), self.output_dtype)
        idx = np.empty((self.batch_size,), np.int32)
        offs = np.empty((self.batch_size, 2), np.int32)
        flips = np.empty((self.batch_size,), np.int32)
        ok = self._lib.sg_prefetcher_next(
            self._handle, out.ctypes.data_as(ctypes.c_void_p),
            _as_i32_ptr(idx), _as_i32_ptr(offs), _as_i32_ptr(flips))
        if not ok:
            raise StopIteration
        return out, idx, offs, flips

    def __iter__(self):
        while True:
            yield self.next()

    def close(self) -> None:
        if self._handle:
            self._lib.sg_prefetcher_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
