"""Native (C++) runtime components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; the host runtime around it is native:
  * ``hpc_assign_decode_tasks`` — decode task scheduler (scheduler.cc),
    wrapped by :mod:`hpc_ops_tpu.ops.attention.scheduler`.
  * :class:`PagedBlockAllocator` — paged-KV block allocator with
    refcounted copy-on-write page tables (block_allocator.cc).

``libhpcsched.so`` is built lazily with ``make`` on first use if missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = None


def native_lib() -> ctypes.CDLL:
    """Load (building if needed) the native runtime library."""
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(_DIR, "libhpcsched.so")
    srcs = [os.path.join(_DIR, s) for s in ("scheduler.cc", "block_allocator.cc")]
    if not os.path.exists(path) or any(
        os.path.getmtime(s) > os.path.getmtime(path) for s in srcs
    ):
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(path)
    lib.hpc_kv_allocator_create.restype = ctypes.c_void_p
    lib.hpc_kv_allocator_create.argtypes = [ctypes.c_int32, ctypes.c_int32]
    lib.hpc_kv_allocator_destroy.argtypes = [ctypes.c_void_p]
    lib.hpc_kv_num_free.restype = ctypes.c_int32
    lib.hpc_kv_num_free.argtypes = [ctypes.c_void_p]
    lib.hpc_kv_extend.restype = ctypes.c_int32
    lib.hpc_kv_extend.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
    lib.hpc_kv_table.restype = ctypes.c_int32
    lib.hpc_kv_table.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ]
    lib.hpc_kv_length.restype = ctypes.c_int64
    lib.hpc_kv_length.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.hpc_kv_fork.restype = ctypes.c_int32
    lib.hpc_kv_fork.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
    lib.hpc_kv_share_prefix.restype = ctypes.c_int32
    lib.hpc_kv_share_prefix.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32
    ]
    lib.hpc_kv_cow_last.restype = ctypes.c_int32
    lib.hpc_kv_cow_last.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)
    ]
    lib.hpc_kv_free.restype = ctypes.c_int32
    lib.hpc_kv_free.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    _LIB = lib
    return lib


class PagedBlockAllocator:
    """Paged-KV block allocator (native; see block_allocator.cc).

    Tracks physical cache pages for live sequences: O(1) grow/free,
    refcounted prefix sharing via :meth:`fork`, and copy-on-write of the
    tail block for forked sequences that keep decoding (:meth:`cow_last`).
    The device arrays never move — only the page tables this class hands
    to the attention kernels change.
    """

    def __init__(self, num_blocks: int, block_size: int):
        self._lib = native_lib()
        self._h = self._lib.hpc_kv_allocator_create(num_blocks, block_size)
        self.num_blocks = num_blocks
        self.block_size = block_size

    def __del__(self):  # pragma: no cover - interpreter shutdown
        try:
            self._lib.hpc_kv_allocator_destroy(self._h)
        except Exception:
            pass

    @property
    def num_free(self) -> int:
        return int(self._lib.hpc_kv_num_free(self._h))

    def extend(self, seq: int, num_tokens: int) -> int:
        """Grow `seq` to cover `num_tokens`; returns its block count.

        Raises MemoryError when the pool is exhausted."""
        n = self._lib.hpc_kv_extend(self._h, seq, num_tokens)
        if n < 0:
            raise MemoryError(
                f"KV pool exhausted: seq {seq} needs blocks for "
                f"{num_tokens} tokens, {self.num_free} free"
            )
        return int(n)

    def table(self, seq: int, pad_to: int | None = None) -> np.ndarray:
        """Page table of `seq` as int32, padded to pad_to with -1.

        Padding is -1 (not 0): page 0 is a real pool page, so zero padding
        would silently alias it — every consumer (rope store, decode,
        prefill) drops or masks negative page ids, making an
        under-extended sequence loud instead of corrupting page 0."""
        n = self._lib.hpc_kv_table(self._h, seq, None, 0)
        if n < 0:
            raise KeyError(f"unknown sequence {seq}")
        cap = max(n, pad_to or 0)
        out = np.full(cap, -1, np.int32)
        self._lib.hpc_kv_table(
            self._h, seq, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n
        )
        return out

    def length(self, seq: int) -> int:
        n = self._lib.hpc_kv_length(self._h, seq)
        if n < 0:
            raise KeyError(f"unknown sequence {seq}")
        return int(n)

    def fork(self, parent: int, child: int) -> int:
        """Share all of parent's blocks with child (copy-on-write)."""
        n = self._lib.hpc_kv_fork(self._h, parent, child)
        if n < 0:
            raise KeyError(f"cannot fork {parent} -> {child}")
        return int(n)

    def share_prefix(self, parent: int, child: int, num_blocks: int) -> int:
        """Share parent's first num_blocks FULLY-WRITTEN blocks with a new
        sequence `child` (refcounted, read-only for the child — its own
        writes start at the next, freshly-allocated block, so no
        copy-on-write is involved). The prefix-caching primitive."""
        n = self._lib.hpc_kv_share_prefix(self._h, parent, child, num_blocks)
        if n < 0:
            raise KeyError(
                f"cannot share {num_blocks} blocks of {parent} -> {child}"
            )
        return int(n)

    def cow_last(self, seq: int) -> tuple[int, int]:
        """Make seq's tail block exclusive. Returns (block, copied_from);
        copied_from is -1 when no copy was needed, else the caller must copy
        that physical page's contents to `block` on device."""
        src = ctypes.c_int32(-1)
        blk = self._lib.hpc_kv_cow_last(self._h, seq, ctypes.byref(src))
        if blk == -2:
            raise MemoryError("KV pool exhausted during copy-on-write")
        if blk < 0:
            raise KeyError(f"unknown or empty sequence {seq}")
        return int(blk), int(src.value)

    def free(self, seq: int) -> int:
        n = self._lib.hpc_kv_free(self._h, seq)
        if n < 0:
            raise KeyError(f"unknown sequence {seq}")
        return int(n)


__all__ = ["PagedBlockAllocator", "native_lib"]
