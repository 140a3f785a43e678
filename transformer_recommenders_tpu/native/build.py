"""JIT build + ctypes binding for the native sampler.

The shared library is compiled on first use with g++ into a content-hashed
cache (so source edits rebuild automatically) and bound via ctypes — no
pybind11 required.  Environments without a compiler fall back to the numpy
sampler (``data/dataset.py``) transparently.
"""

from __future__ import annotations

import ctypes
import hashlib
import pathlib
import subprocess
import tempfile

import numpy as np

_SRC = pathlib.Path(__file__).parent / "sampler.cpp"
_CACHE = pathlib.Path.home() / ".cache" / "xrt_native"


class NativeSampler:
    def __init__(self, lib: ctypes.CDLL) -> None:
        self._lib = lib
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.sample_batch.argtypes = [
            i32p, u8p, i64p, ctypes.c_int64,
            i64p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int64,
            i32p, i32p, i32p,
        ]
        lib.sample_batch.restype = None
        lib.shuffled_order.argtypes = [
            ctypes.c_int64, ctypes.c_uint64, ctypes.c_uint64, i64p
        ]
        lib.shuffled_order.restype = None

    def sample_batch(
        self,
        values: np.ndarray,
        labels: np.ndarray,
        offsets: np.ndarray,
        row_indices: np.ndarray,
        *,
        max_seq: int,
        pos_lookahead: int,
        num_items: int,
        seed: int,
        epoch: int,
        num_threads: int = 0,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """num_threads=0 -> hardware concurrency (clamped in C++); the
        per-row RNG streams are keyed, so any thread count produces
        bit-identical batches.  The ctypes call releases the GIL, so the
        producer thread's sampling overlaps device steps."""
        b = len(row_indices)
        hist = np.zeros((b, max_seq), np.int32)
        pos = np.zeros((b, max_seq), np.int32)
        neg = np.zeros((b, max_seq), np.int32)
        self._lib.sample_batch(
            values, labels, offsets, len(offsets) - 1,
            np.ascontiguousarray(row_indices, np.int64), b,
            max_seq, pos_lookahead, num_items,
            seed & 0xFFFFFFFFFFFFFFFF, epoch, num_threads,
            hist, pos, neg,
        )
        return hist, pos, neg

    def shuffled_order(self, n: int, seed: int, epoch: int) -> np.ndarray:
        out = np.empty(n, np.int64)
        self._lib.shuffled_order(n, seed & 0xFFFFFFFFFFFFFFFF, epoch, out)
        return out


def _build() -> pathlib.Path | None:
    src = _SRC.read_bytes()
    digest = hashlib.sha256(src).hexdigest()[:16]
    _CACHE.mkdir(parents=True, exist_ok=True)
    so = _CACHE / f"sampler_{digest}.so"
    if so.exists():
        return so
    with tempfile.TemporaryDirectory(dir=_CACHE) as tmp:
        tmp_so = pathlib.Path(tmp) / "sampler.so"
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            # -pthread is required for std::thread: on glibc < 2.34 the weak
            # pthread_create symbol is otherwise unresolved and std::thread's
            # constructor aborts the process via std::terminate.
            "-pthread",
            str(_SRC), "-o", str(tmp_so),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            return None
        tmp_so.rename(so)
    return so


_cached: NativeSampler | None | bool = False  # False = not attempted


def load_native_sampler() -> NativeSampler | None:
    """Build/load the native sampler; None when no toolchain is available."""
    global _cached
    if _cached is False:
        so = _build()
        _cached = NativeSampler(ctypes.CDLL(str(so))) if so else None
    return _cached
