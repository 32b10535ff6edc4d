"""Native (C++) runtime components, bound via ctypes.

The reference's runtime-native pieces all live inside vLLM (block manager,
allocator — SURVEY.md §2.2); ours live here.  The library is compiled on
first use with g++ (cached next to the sources); if no toolchain is present
we fall back to a pure-Python implementation with identical semantics so the
framework stays importable everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "src" / "block_allocator.cc"
_BUILD = Path(__file__).parent / "build"
_LIB: Optional[ctypes.CDLL] = None
_LOCK = threading.Lock()


def _compile() -> Optional[ctypes.CDLL]:
    so = _BUILD / "libcbx_runtime.so"
    try:
        if not so.exists() or so.stat().st_mtime < _SRC.stat().st_mtime:
            _BUILD.mkdir(exist_ok=True)
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(so)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(so))
    except (OSError, subprocess.CalledProcessError):
        return None
    lib.cbx_allocator_new.restype = ctypes.c_void_p
    lib.cbx_allocator_new.argtypes = [ctypes.c_int32] * 3
    lib.cbx_allocator_delete.argtypes = [ctypes.c_void_p]
    lib.cbx_num_free.restype = ctypes.c_int32
    lib.cbx_num_free.argtypes = [ctypes.c_void_p]
    lib.cbx_seq_num_blocks.restype = ctypes.c_int32
    lib.cbx_seq_num_blocks.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.cbx_seq_reserve.restype = ctypes.c_int32
    lib.cbx_seq_reserve.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                    ctypes.c_int32]
    lib.cbx_seq_release.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.cbx_seq_table.restype = ctypes.c_int32
    lib.cbx_seq_table.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                  ctypes.POINTER(ctypes.c_int32),
                                  ctypes.c_int32]
    lib.cbx_full_table.restype = ctypes.c_int32
    lib.cbx_full_table.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_int32),
                                   ctypes.c_int64]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    with _LOCK:
        if _LIB is None:
            _LIB = _compile() or False  # False = tried and failed
    return _LIB or None


class NativeBlockAllocator:
    """C++ paged-KV block allocator (free list + per-seq block tables)."""

    def __init__(self, num_blocks: int, max_seqs: int, blocks_per_seq: int):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("native runtime unavailable (no g++?)")
        self._lib = lib
        self._h = lib.cbx_allocator_new(num_blocks, max_seqs, blocks_per_seq)
        if not self._h:
            raise ValueError("bad allocator geometry")
        self.num_blocks = num_blocks
        self.max_seqs = max_seqs
        self.blocks_per_seq = blocks_per_seq

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.cbx_allocator_delete(h)
            self._h = None

    @property
    def num_free(self) -> int:
        return self._lib.cbx_num_free(self._h)

    def seq_num_blocks(self, seq: int) -> int:
        return self._lib.cbx_seq_num_blocks(self._h, seq)

    def reserve(self, seq: int, n_blocks: int) -> bool:
        """Grow seq to >= n_blocks. False on OOM (nothing allocated)."""
        return self._lib.cbx_seq_reserve(self._h, seq, n_blocks) == 0

    def release(self, seq: int) -> None:
        self._lib.cbx_seq_release(self._h, seq)

    def table(self, seq: int) -> np.ndarray:
        out = np.empty((self.blocks_per_seq,), np.int32)
        n = self._lib.cbx_seq_table(
            self._h, seq, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.blocks_per_seq)
        if n < 0:
            raise ValueError(f"bad seq {seq}")
        return out

    def full_table(self) -> np.ndarray:
        out = np.empty((self.max_seqs, self.blocks_per_seq), np.int32)
        rc = self._lib.cbx_full_table(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.size)
        assert rc == 0
        return out


class PyBlockAllocator:
    """Pure-Python fallback with semantics identical to the C++ allocator."""

    def __init__(self, num_blocks: int, max_seqs: int, blocks_per_seq: int):
        self.num_blocks = num_blocks
        self.max_seqs = max_seqs
        self.blocks_per_seq = blocks_per_seq
        self._free = list(range(num_blocks - 1, -1, -1))
        self._tables = np.full((max_seqs, blocks_per_seq), -1, np.int32)
        self._held = np.zeros((max_seqs,), np.int32)

    @property
    def num_free(self) -> int:
        return len(self._free)

    def seq_num_blocks(self, seq: int) -> int:
        return int(self._held[seq])

    def reserve(self, seq: int, n_blocks: int) -> bool:
        if n_blocks > self.blocks_per_seq:
            return False
        need = n_blocks - int(self._held[seq])
        if need <= 0:
            return True
        if need > len(self._free):
            return False
        for i in range(need):
            self._tables[seq, self._held[seq] + i] = self._free.pop()
        self._held[seq] = n_blocks
        return True

    def release(self, seq: int) -> None:
        for i in range(int(self._held[seq])):
            self._free.append(int(self._tables[seq, i]))
            self._tables[seq, i] = -1
        self._held[seq] = 0

    def table(self, seq: int) -> np.ndarray:
        return self._tables[seq].copy()

    def full_table(self) -> np.ndarray:
        return self._tables.copy()


def make_block_allocator(num_blocks: int, max_seqs: int, blocks_per_seq: int):
    """Native allocator if the toolchain is available, Python otherwise."""
    try:
        return NativeBlockAllocator(num_blocks, max_seqs, blocks_per_seq)
    except (RuntimeError, ValueError):
        return PyBlockAllocator(num_blocks, max_seqs, blocks_per_seq)
