"""Dynamic decode task scheduler: flat-bin packing of (kv_head x batch) KV
ranges into uniform work tiles.

Reference parity: hpc/attention.py:520-626 (get_attention_decode_task_workspace
/ assign_attention_decode_task) and src/attention/decode/assign_task.cu. The
reference bin-packs tiles onto CTAs to balance SMs under skewed KV-length
mixes (its headline 2.88x, README.md:174). On TPU the analog balances the
grid: instead of a (batch, head, max_tiles) grid where skewed mixes burn
skipped programs, the task-scheduled kernel runs grid=(num_tasks,) over
exactly the work that exists, each task being a contiguous KV chunk of one
(batch, kv_head); split-k partials merge in a segment-combine epilogue.

Two interchangeable implementations produce identical task maps:
  * a vectorized jnp one (jit-able — scheduling runs on-device inside the
    serving step, the analog of the reference's CUDA assigner), and
  * a native C++ one (hpc_ops_tpu/runtime, ctypes — the analog of the
    reference's CPU assigner; used for host-side scheduling and as the
    golden in equivalence tests, mirroring the reference's CPU/CUDA pairing).
"""

from __future__ import annotations

import ctypes
import os
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from hpc_ops_tpu.utils.common import cdiv


class TaskMap(NamedTuple):
    """Flat decode task list (capacity static, count dynamic).

    All arrays have leading dim = capacity; entries past ``num_tasks`` are
    sentinels (batch = -1).
    """

    batch: jax.Array  # [T] int32 request index
    head: jax.Array  # [T] int32 kv-head index
    tile_start: jax.Array  # [T] int32 first work tile (units of tile tokens)
    num_tiles: jax.Array  # [T] int32 tiles in this task
    seg: jax.Array  # [T] int32 segment id = batch * H + head (for combine)
    num_tasks: jax.Array  # [] int32
    num_segs: int  # static: B * H
    tile: int = 512  # static: tokens per work tile (what `tile_start` counts)

    @property
    def capacity(self) -> int:
        return self.batch.shape[0]


def task_capacity(
    max_num_batch: int,
    max_seqlen: int,
    num_head_kv: int,
    tile: int,
    min_tiles: int,
    num_tasks_target: int = 256,
) -> int:
    """Static upper bound on task count (reference analog:
    get_attention_decode_task_workspace, hpc/attention.py:540-582).

    Two regimes bound the count: splitting everything at min_tiles
    granularity, and the target-capped regime where the scheduler packs to
    ~num_tasks_target tasks plus at most one partial task per (batch, head).
    Oversized capacity is pure waste — sentinel tasks still cost a grid
    step each in the task-scheduled kernel."""
    max_tiles = max_num_batch * num_head_kv * cdiv(max_seqlen, tile)
    fine = cdiv(max_tiles, max(min_tiles, 1)) + max_num_batch * num_head_kv
    packed = num_tasks_target + 2 * max_num_batch * num_head_kv
    return min(fine, packed)


def assign_decode_tasks_np(
    kv_lens: np.ndarray,
    num_head_kv: int,
    capacity: int,
    tile: int = 512,
    num_tasks_target: int = 256,
    min_process_len: int = 4096,
):
    """Reference/native-equivalent scheduler in numpy (host path)."""
    b = kv_lens.shape[0]
    tiles = np.maximum((kv_lens + tile - 1) // tile, 1)
    total = int(tiles.sum()) * num_head_kv
    tpt = max(-(-total // num_tasks_target), min_process_len // tile, 1)

    batch = np.full(capacity, -1, np.int32)
    head = np.zeros(capacity, np.int32)
    tile_start = np.zeros(capacity, np.int32)
    num_tiles = np.zeros(capacity, np.int32)
    seg = np.zeros(capacity, np.int32)
    t = 0
    for bi in range(b):
        nb = int(tiles[bi])
        for h in range(num_head_kv):
            start = 0
            while start < nb:
                n = min(tpt, nb - start)
                batch[t] = bi
                head[t] = h
                tile_start[t] = start
                num_tiles[t] = n
                seg[t] = bi * num_head_kv + h
                start += n
                t += 1
    return batch, head, tile_start, num_tiles, seg, t


def assign_decode_tasks_jnp(
    kv_lens: jax.Array,
    num_head_kv: int,
    capacity: int,
    tile: int = 512,
    num_tasks_target: int = 256,
    min_process_len: int = 4096,
) -> TaskMap:
    """Vectorized jit-able scheduler; identical output to the numpy/native
    versions."""
    b = kv_lens.shape[0]
    tiles = jnp.maximum((kv_lens.astype(jnp.int32) + tile - 1) // tile, 1)  # [B]
    total = jnp.sum(tiles) * num_head_kv
    tpt = jnp.maximum(
        jnp.maximum(-(-total // num_tasks_target), min_process_len // tile), 1
    )

    # chunks per (b, h): nc[b] = cdiv(tiles[b], tpt), repeated per head
    nc_b = (tiles + tpt - 1) // tpt  # [B]
    nc = jnp.repeat(nc_b, num_head_kv)  # [B*H] (b-major, h-minor)
    cu = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nc).astype(jnp.int32)]
    )  # [B*H+1]
    num_tasks = cu[-1]

    t = jnp.arange(capacity, dtype=jnp.int32)
    bh = jnp.minimum(
        jnp.searchsorted(cu[1:], t, side="right").astype(jnp.int32),
        b * num_head_kv - 1,
    )
    chunk = t - cu[bh]
    bi = bh // num_head_kv
    hi = bh % num_head_kv
    start = chunk * tpt
    n = jnp.minimum(tpt, tiles[bi] - start)
    valid = t < num_tasks
    return TaskMap(
        batch=jnp.where(valid, bi, -1),
        head=jnp.where(valid, hi, 0),
        tile_start=jnp.where(valid, start, 0),
        num_tiles=jnp.where(valid, n, 0),
        seg=jnp.where(valid, bh, 0),
        num_tasks=num_tasks,
        num_segs=b * num_head_kv,
        tile=tile,
    )


_LIB = None


def _native_lib():
    global _LIB
    if _LIB is None:
        from hpc_ops_tpu.runtime import native_lib

        _LIB = native_lib()  # builds the .so lazily if missing/stale
        _LIB.hpc_assign_decode_tasks.restype = ctypes.c_int
        _LIB.hpc_assign_decode_tasks.argtypes = [
            ctypes.POINTER(ctypes.c_int32),  # kv_lens
            ctypes.c_int,  # batch
            ctypes.c_int,  # num_head_kv
            ctypes.c_int,  # capacity
            ctypes.c_int,  # tile
            ctypes.c_int,  # num_tasks_target
            ctypes.c_int,  # min_process_len
            ctypes.POINTER(ctypes.c_int32),  # out batch
            ctypes.POINTER(ctypes.c_int32),  # out head
            ctypes.POINTER(ctypes.c_int32),  # out tile_start
            ctypes.POINTER(ctypes.c_int32),  # out num_tiles
            ctypes.POINTER(ctypes.c_int32),  # out seg
        ]
    return _LIB


def assign_decode_tasks_native(
    kv_lens: np.ndarray,
    num_head_kv: int,
    capacity: int,
    tile: int = 512,
    num_tasks_target: int = 256,
    min_process_len: int = 4096,
):
    """C++ scheduler via ctypes (hpc_ops_tpu/runtime/scheduler.cc)."""
    lib = _native_lib()
    kv = np.ascontiguousarray(kv_lens, np.int32)
    b = kv.shape[0]
    out = [np.zeros(capacity, np.int32) for _ in range(5)]
    out[0][:] = -1

    def ptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    n = lib.hpc_assign_decode_tasks(
        ptr(kv), b, num_head_kv, capacity, tile, num_tasks_target,
        min_process_len, *map(ptr, out),
    )
    return (*out, n)


def assign_attention_decode_task(
    num_seq_kvcache,
    num_head_kv: int,
    mtp: int = 0,
    new_kv_included: bool = True,
    min_process_len: int = 4096,
    *,
    capacity: int | str | None = None,
    tile: int = 512,
    num_tasks_target: int = 256,
    impl: str = "jnp",
) -> TaskMap:
    """Public scheduler entry (reference: hpc/attention.py:585-626).

    ``capacity``: static task-array length. Sentinel tasks past num_tasks
    each still cost a grid step in the task kernel, so oversized capacity
    directly burns time. Host impls ("np"/"native") accept
    ``capacity="tight"``: size to the actual task count rounded up to 32
    (one recompile per 32-task bucket — serving batches cross buckets
    rarely).
    """
    sq = mtp + 1
    kv_lens = jnp.asarray(num_seq_kvcache, jnp.int32) + (0 if new_kv_included else sq)
    b = kv_lens.shape[0]
    if capacity == "tight":
        assert impl != "jnp", "tight capacity needs a host-side scheduler"
        kv_np = np.asarray(kv_lens)
        tiles = np.maximum((kv_np + tile - 1) // tile, 1)
        total = int(tiles.sum()) * num_head_kv
        tpt = max(-(-total // num_tasks_target), min_process_len // tile, 1)
        n_exact = int(
            sum(
                num_head_kv * -(-int(t) // tpt) for t in tiles
            )
        )
        capacity = -(-n_exact // 32) * 32
    if capacity is None:
        capacity = task_capacity(
            b, 128 * 1024, num_head_kv, tile, min_process_len // tile,
            num_tasks_target,
        )
    if impl == "jnp":
        return assign_decode_tasks_jnp(
            kv_lens, num_head_kv, capacity, tile, num_tasks_target, min_process_len
        )
    fn = assign_decode_tasks_native if impl == "native" else assign_decode_tasks_np
    batch, head, tile_start, num_tiles, seg, n = fn(
        np.asarray(kv_lens), num_head_kv, capacity, tile, num_tasks_target,
        min_process_len,
    )
    return TaskMap(
        batch=jnp.asarray(batch),
        head=jnp.asarray(head),
        tile_start=jnp.asarray(tile_start),
        num_tiles=jnp.asarray(num_tiles),
        seg=jnp.asarray(seg),
        num_tasks=jnp.asarray(n, jnp.int32),
        num_segs=b * num_head_kv,
        tile=tile,
    )


def select_decode_mode(
    kv_lens,
    num_head_kv: int,
    *,
    num_cores: int | None = None,
    skew_threshold: float = 4.0,
) -> str:
    """Choose "grid" or "taskmap" from the kv_lens histogram.

    TPU context (vs the reference's CTA bin-packing, assign_task.cu): a
    TPU core executes its grid SEQUENTIALLY, so the inline-chunk-loop grid
    is work-exact for *uniform* mixes and wins them (uniform_4096: grid
    757 vs taskmap 560 GB/s, results/decode_r5.jsonl). But with a skewed
    mix whose short tail is tiny, the grid pays a full per-(b, h) step
    for each near-empty request while the long request's chunk loop
    serializes — the flat task map amortizes both (round-5 grid sweep:
    skewed_extreme 263 vs 136 GB/s = 1.9x, skewed_mix 461 vs 351 = 1.3x).
    Heuristic: taskmap iff max_len > skew_threshold * mean_len AND the
    shortest request is at most one task tile (the tiny-tail signature);
    multi-core chips (v4/v5p megacore) additionally prefer taskmap on any
    skew, since a core-boundary split of the (b, h) grid strands work.
    """
    if num_cores is None:
        try:
            d = jax.devices()[0]
            num_cores = max(getattr(d, "num_cores", 1) or 1, 1)
        except Exception:
            num_cores = 1
    lens = np.asarray(kv_lens, np.int64)
    if lens.size == 0:
        return "grid"
    skewed = lens.max() > skew_threshold * max(lens.mean(), 1.0)
    if num_cores > 1 and skewed:
        return "taskmap"
    if skewed and lens.min() <= 512:
        return "taskmap"
    return "grid"


def get_attention_decode_task_workspace(
    max_num_batch: int,
    max_seqlen: int,
    num_head_kv: int,
    tile: int = 512,
    min_tiles: int = 1,
    num_tasks_target: int = 256,
) -> dict:
    """Workspace accounting for a decode task map (reference:
    get_attention_decode_task_workspace, hpc/attention.py:540-582).

    The reference returns byte offsets into a caller-allocated CUDA
    workspace; on TPU the task map is a set of fixed-shape int32 arrays
    (static shapes are required under jit), so this returns their shapes
    and total footprint instead.
    """
    cap = task_capacity(
        max_num_batch, max_seqlen, num_head_kv, tile, min_tiles,
        num_tasks_target,
    )
    arrays = {
        "batch": (cap,),
        "head": (cap,),
        "tile_start": (cap,),
        "num_tiles": (cap,),
        "seg": (cap,),
    }
    return {
        "capacity": cap,
        "arrays": arrays,
        "total_bytes": sum(4 * s[0] for s in arrays.values()),
    }


def print_attention_decode_task(tm: TaskMap) -> None:
    """Debug pretty-printer (reference: hpc/attention.py:629-696)."""
    n = int(tm.num_tasks)
    print(
        f"[decode task map] num_tasks={n} capacity={tm.capacity} "
        f"num_segs={tm.num_segs}"
    )
    for t in range(n):
        print(
            f"task:{t} ibatch:{int(tm.batch[t])} ihead_kv:{int(tm.head[t])} "
            f"tile_start:{int(tm.tile_start[t])} num_tiles:{int(tm.num_tiles[t])} "
            f"seg:{int(tm.seg[t])}"
        )


__all__ = [
    "TaskMap",
    "task_capacity",
    "assign_decode_tasks_np",
    "assign_decode_tasks_jnp",
    "assign_decode_tasks_native",
    "assign_attention_decode_task",
    "select_decode_mode",
    "get_attention_decode_task_workspace",
    "print_attention_decode_task",
]
