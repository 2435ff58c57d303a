"""Paged-KV DMA helpers for Pallas attention kernels.

Fast-path kernels read KV pages in the "HND" layout
``[num_kv_heads, num_blocks, block_size, head_dim]`` so one (head, page) slab
is contiguous in HBM and loads with a single DMA. Public APIs accept the
reference's logical NHD layout ``[num_blocks, block_size, H, D]``
(hpc/attention.py:93-105) and convert; models built on this framework keep
caches in HND natively.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def nhd_to_hnd(cache: jax.Array) -> jax.Array:
    """[num_blocks, bs, H, D] -> [H, num_blocks, bs, D]."""
    return jnp.transpose(cache, (2, 0, 1, 3))


def hnd_to_nhd(cache: jax.Array) -> jax.Array:
    return jnp.transpose(cache, (1, 2, 0, 3))


def pack_kv_fused(k_pages: jax.Array, v_pages: jax.Array) -> jax.Array:
    """[H, nb, bs, D] x2 -> fused [H, nb, 2*bs, D]: rows [0:bs] = K,
    rows [bs:2bs] = V of the same page.

    The fused layout exists because decode is DMA-*issue*-bound before it is
    byte-bound on this hardware (~20ns/descriptor): one descriptor per page
    moves K and V together, halving the issue count per KV token. This is
    the native cache layout of the serving engine; per-page slabs double to
    32KB (bf16) / 16KB (int8).
    """
    return jnp.concatenate([k_pages, v_pages], axis=2)


def unpack_kv_fused(kv_pages: jax.Array):
    """Fused [H, nb, 2*bs, D] -> ([H, nb, bs, D], [H, nb, bs, D])."""
    bs = kv_pages.shape[2] // 2
    return kv_pages[:, :, :bs], kv_pages[:, :, bs:]


def pack_kv_fused_nhd(k_pages: jax.Array, v_pages: jax.Array) -> jax.Array:
    """[H, nb, bs, D] x2 -> slot-leading fused [nb, 2*bs, H*D].

    The NHD-fused layout: one page slab holds K rows [0:bs] and V rows
    [bs:2bs] for ALL kv heads (a token's row is [H*D] contiguous). Two wins
    over the head-major fused layout:

    * decode reads ONE descriptor per page for every head (8x fewer
      descriptors at hkv=8) — the issue-rate bottleneck disappears and the
      int8 read becomes purely transfer-bound;
    * the slot dim leads, so the fused Pallas RoPE+quant+store kernel's
      per-token DMA is a legal leading-dim slice (Mosaic forbids the
      sublane-dim token slices a head-major cache would need).
    """
    h, nb, bs, d = k_pages.shape
    k = jnp.transpose(k_pages, (1, 2, 0, 3)).reshape(nb, bs, h * d)
    v = jnp.transpose(v_pages, (1, 2, 0, 3)).reshape(nb, bs, h * d)
    return jnp.concatenate([k, v], axis=1)


def unpack_kv_fused_nhd(kv_pages: jax.Array, num_kv_heads: int):
    """NHD-fused [nb, 2*bs, H*D] -> ([H, nb, bs, D], [H, nb, bs, D])."""
    nb, bs2, hd = kv_pages.shape
    bs = bs2 // 2
    d = hd // num_kv_heads
    k = kv_pages[:, :bs].reshape(nb, bs, num_kv_heads, d)
    v = kv_pages[:, bs:].reshape(nb, bs, num_kv_heads, d)
    return jnp.transpose(k, (2, 0, 1, 3)), jnp.transpose(v, (2, 0, 1, 3))


class MultiPageCopy:
    """One async DMA per KV page: HBM pages -> VMEM slab.

    pages_ref: [H, num_blocks, block_size, D] (ANY/HBM)
    buf_ref:   [num_buffers, pages_per_block, block_size, D] (VMEM)
    sem:       single DMA semaphore shared by the page copies.

    Pages are non-contiguous; all DMAs start concurrently so latency is the
    slowest single page, not the sum.
    """

    def __init__(self, pages_ref, buf_ref, sem, block_tbl_ref, *, head,
                 page_start, num_pages, slot, num_valid=None,
                 nhd_lane_dim=None):
        # block_tbl entries must already be valid page ids (callers clamp
        # padding entries to 0 once, outside the kernel) — a per-page clip
        # here would cost ~4 scalar-core ops per page per construction,
        # which measurably slows DMA issue on wide fan-outs.
        #
        # num_valid (traced scalar, optional): only pages [0, num_valid) are
        # copied/waited. Without it a short sequence's last chunk DMAs the
        # full pcb pages of clamped-to-0 table entries — up to chunk/kv_len x
        # over-fetch on skewed batches (this was a 2x+ loss on the mixed
        # decode scenarios).
        # nhd_lane_dim=D: pages_ref is the flat NHD view [nb, bs, H*D] and
        # the head is selected as a 128-aligned LANE slice — a legal strided
        # DMA (last-dim slices at lane-tile multiples), so the reference's
        # NHD layout costs O(touched pages) with no cache transpose. The
        # per-row contiguous run shrinks to D*dtype bytes (256B bf16), which
        # trades a little HBM burst efficiency for zero repacking.
        # head=None: pages_ref is slot-leading ([nb, rows, H*D], the
        # NHD-fused layout) and one descriptor moves the page's rows for
        # ALL heads — the full contiguous slab.
        self._copies = []
        self._num_valid = num_valid
        for i in range(num_pages):
            phys = block_tbl_ref[page_start + i]
            if head is None:
                src = pages_ref.at[phys]
            elif nhd_lane_dim is not None:
                src = pages_ref.at[
                    phys, :, pl.ds(head * nhd_lane_dim, nhd_lane_dim)
                ]
            else:
                src = pages_ref.at[head, phys]
            self._copies.append(
                pltpu.make_async_copy(src, buf_ref.at[slot, i], sem)
            )

    def _each(self, op):
        if self._num_valid is None:
            for c in self._copies:
                op(c)
            return
        # predication is GROUP-granular (<= 8 predicated regions): per-page
        # pl.when at pcb=64 exploded Mosaic trace/compile time (~35 min for
        # one kernel). A tail chunk over-fetches at most group_size-1 pages
        # (<= pcb/8), which is noise next to the full-chunk over-fetch this
        # exists to prevent.
        n = len(self._copies)
        gsz = max(1, -(-n // 8))
        for g0 in range(0, n, gsz):
            grp = self._copies[g0 : g0 + gsz]
            if g0 == 0:
                for c in grp:  # chunks always hold >= 1 valid page
                    op(c)
                continue

            @pl.when(g0 < self._num_valid)
            def _(grp=grp):
                for c in grp:
                    op(c)

    def start(self):
        self._each(lambda c: c.start())

    def wait(self):
        self._each(lambda c: c.wait())


__all__ = [
    "nhd_to_hnd",
    "hnd_to_nhd",
    "pack_kv_fused",
    "unpack_kv_fused",
    "MultiPageCopy",
]
